"""Flagship pipeline: byte-identical extraction invariant, checkpoint
resume, lineage metrics."""

from go_spatial_spark.pipeline import flagship_pipeline, wrap_html, extract_text
from go_spatial_spark.checkpoint import CheckpointManager
from pyspark.sql import functions as F


def test_extraction_invariant(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    pages = wrap_html(docs).withColumn("text2", extract_text(F.col("html")))
    assert pages.where(F.col("text") != F.col("text2")).count() == 0
    # byte-identical, not just equal strings: compare encoded bytes
    assert pages.where(
        F.encode("text", "utf-8") != F.encode("text2", "utf-8")).count() == 0


def test_pipeline_checkpoint_resume(spark, sf001, tmp_path):
    ck_dir = str(tmp_path / "ck")
    out1 = flagship_pipeline(spark, sf001, ck_dir).toPandas()
    ck = CheckpointManager(ck_dir)
    m1 = ck.metrics()
    assert {m["stage"] for m in m1} == {"extract", "cells", "pip"}
    assert all(m["rows"] > 0 for m in m1)
    assert all(m["partition_rows"] for m in m1)
    # resume: second run must not rebuild any stage (no new metrics)
    out2 = flagship_pipeline(spark, sf001, ck_dir).toPandas()
    m2 = ck.metrics()
    assert len(m2) == len(m1)
    a = set(map(tuple, out1[["doc_id", "polygon_id"]].itertuples(index=False)))
    b = set(map(tuple, out2[["doc_id", "polygon_id"]].itertuples(index=False)))
    assert a == b and len(a) > 0
