"""Deterministic geocoding of the documents table.

Per BASELINE.json#input_hint the payload is Common-Crawl-style pages;
geocoding derives (lat, lon) per document. In this sandbox there is no
real geo dictionary, so geocoding is a deterministic pure-arithmetic
assignment keyed on doc_id, with a built-in **urban hotspot**: 20% of
documents (doc_id % 5 == 0) land in a 0.25 x 0.25 degree box — the skew
pattern the salting/AQE machinery must defeat (FIXTURES.md §1).

All values are multiples of 2^-8 (exactly representable), so Spark and
DuckDB agree bit-for-bit. Implemented as JVM-side Column expressions
(no Python in the hot path) with matching SQL text for oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from go_spatial_spark.cellindex import cell_col, cell_sql

HOTSPOT_LAT = 43.0
HOTSPOT_LON = -79.0
DEFAULT_RES = 12


def lat_col(doc_id: Column) -> Column:
    normal = ((doc_id * 7919) % 23040 - 11520).cast("double") / 128.0
    hot = F.lit(HOTSPOT_LAT) + ((doc_id * 31) % 64).cast("double") / 256.0
    return F.when(doc_id % 5 == 0, hot).otherwise(normal)


def lon_col(doc_id: Column) -> Column:
    normal = ((doc_id * 104729) % 46080 - 23040).cast("double") / 128.0
    hot = F.lit(HOTSPOT_LON) + ((doc_id * 37) % 64).cast("double") / 256.0
    return F.when(doc_id % 5 == 0, hot).otherwise(normal)


def geocode(docs: DataFrame, res: int = DEFAULT_RES) -> DataFrame:
    """documents -> + (lat, lon, cell). Pure Column arithmetic."""
    d = F.col("doc_id")
    out = docs.withColumn("lat", lat_col(d)).withColumn("lon", lon_col(d))
    return out.withColumn("cell", cell_col(F.col("lon"), F.col("lat"), res))


def lat_sql(doc_id: str = "doc_id") -> str:
    return (f"(CASE WHEN {doc_id} % 5 = 0 "
            f"THEN 43.0 + CAST(({doc_id} * 31) % 64 AS DOUBLE) / 256.0 "
            f"ELSE CAST(({doc_id} * 7919) % 23040 - 11520 AS DOUBLE) / 128.0 END)")


def lon_sql(doc_id: str = "doc_id") -> str:
    return (f"(CASE WHEN {doc_id} % 5 = 0 "
            f"THEN -79.0 + CAST(({doc_id} * 37) % 64 AS DOUBLE) / 256.0 "
            f"ELSE CAST(({doc_id} * 104729) % 46080 - 23040 AS DOUBLE) / 128.0 END)")


def geocode_sql(res: int, dialect: str, doc_id: str = "doc_id") -> dict[str, str]:
    """SQL fragments {lat, lon, cell} for the given dialect."""
    la, lo = lat_sql(doc_id), lon_sql(doc_id)
    return {"lat": la, "lon": lo, "cell": cell_sql(lo, la, res, dialect)}
