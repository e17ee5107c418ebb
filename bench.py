"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Grid operators run on a 1024x1024 synthetic DEM (tile 256) — 1M cells,
16 tiles — sf-independent; document/embedding operators run on the
sf-dir parquet. Per-query wall seconds plus derived docs/sec and
tiles/sec throughputs (BASELINE.md metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from go_spatial_spark.session import get_spark  # noqa: E402
from go_spatial_spark.grid import (  # noqa: E402
    RasterMeta, long_to_tiles, run_stencil, synthetic_dem, tiles_to_long,
)
from go_spatial_spark import kernels  # noqa: E402
from go_spatial_spark.geocode import geocode  # noqa: E402
from go_spatial_spark.operators import dedup, similarity, textstats  # noqa: E402
from go_spatial_spark.operators.spatial_join import (  # noqa: E402
    knn_self, point_in_polygon,
)
from go_spatial_spark.operators.window_stats import quantiles  # noqa: E402

BENCH_ROWS, BENCH_COLS, BENCH_TILE = 1024, 1024, 256
BMETA = RasterMeta(rows=BENCH_ROWS, cols=BENCH_COLS)


def scaling_workload(spark, cpus: int, sf_dir: str) -> dict:
    """Compute-bound workload for the N-vs-4N scaling measurement:
    per-query work is large enough that kernel/JVM compute dominates
    scheduler + Python-worker overhead (the regular sf0.1 suite is
    overhead-bound locally and anti-scales past ~8 threads)."""
    R = C = 3072
    T = 256
    meta = RasterMeta(rows=R, cols=C)
    tiles = long_to_tiles(synthetic_dem(spark, R, C), meta, tile=T).cache()
    n_tiles = tiles.count()

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb8 = None
    for i in range(4):
        part = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        emb8 = part if emb8 is None else emb8.unionByName(part)
    emb8 = emb8.repartition(4 * cpus).cache()
    n_vecs = emb8.count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs8 = None
    for i in range(8):
        part = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        docs8 = part if docs8 is None else docs8.unionByName(part)
    docs8 = docs8.repartition(4 * cpus).cache()
    n_docs = docs8.count()

    def st(kernel, halo, **extra):
        return lambda: run_stencil(
            tiles, meta, kernel, halo=halo, tile=T,
            ctx_extra=extra or None, output="long").count()

    qs = {
        "slope_3072": st(kernels.slope_kernel, 1),
        "hillshade_3072": st(kernels.hillshade_kernel, 1),
        "dev_3072_r8": st(kernels.deviation_from_mean_kernel, 8,
                          r=8, k=300.0),
        "cosine_topk_8k": lambda: similarity.cosine_topk(emb8).count(),
        "minhash_40k": lambda: dedup.minhash_signatures(docs8).count(),
        "pip_40k": lambda: point_in_polygon(
            geocode(docs8).select("doc_id", "lat", "lon"), spark).count(),
    }
    times = {}
    for name, fn in qs.items():
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        fn()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"[bench] {name} {times[name]:.2f}s", file=sys.stderr,
              flush=True)
    total = round(sum(times.values()), 3)
    return {"metric": "scaling_suite_wall_seconds", "value": total,
            "unit": "sec", "queries": times, "cpus": cpus,
            "docs_per_sec": round(n_docs * 2 / (times["minhash_40k"]
                                                + times["pip_40k"]), 1),
            "tiles_per_sec": round(n_tiles * 3 / (
                times["slope_3072"] + times["hillshade_3072"]
                + times["dev_3072_r8"]), 2),
            "n_docs": n_docs, "n_tiles": n_tiles, "n_vecs": n_vecs}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("gss-bench", cpus=cpus)
    if os.environ.get("SPARK_GRAFT_BENCH_MODE") == "scaling":
        result = scaling_workload(spark, cpus, sf_dir)
        result["sf"] = sf
        print(json.dumps(result))
        return

    par = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(
        f"{sf_dir}/documents.parquet").repartition(par).cache()
    n_docs = docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(par).cache()
    emb.count()
    events = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(par).cache()
    events.count()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(par).cache()
    li.count()

    dem_tiles = long_to_tiles(
        synthetic_dem(spark, BENCH_ROWS, BENCH_COLS), BMETA,
        tile=BENCH_TILE).cache()
    n_tiles = dem_tiles.count()

    pts = geocode(docs).select("doc_id", "lat", "lon")

    def st(kernel, halo, **extra):
        return lambda: run_stencil(
            dem_tiles, BMETA, kernel, halo=halo, tile=BENCH_TILE,
            ctx_extra=extra or None, output="long").count()

    bench_queries = {
        "pip_join": lambda: point_in_polygon(pts, spark).count(),
        "knn": lambda: knn_self(pts, k=5).count(),
        "cell_assign": lambda: geocode(docs).count(),
        "minhash_signatures": lambda: dedup.minhash_signatures(docs).count(),
        "simhash": lambda: dedup.simhash(docs).count(),
        "ngram_jaccard_top1": lambda: dedup.ngram_jaccard_top1(docs).count(),
        "cosine_topk": lambda: similarity.cosine_topk(emb).count(),
        "ivf_topk": lambda: similarity.ivf_topk(emb).count(),
        "token_stats": lambda: textstats.token_stats(docs).count(),
        "slope": st(kernels.slope_kernel, 1),
        "hillshade": st(kernels.hillshade_kernel, 1),
        "mean_filter": st(kernels.mean_filter_kernel, 2, rx=2, ry=2),
        "dev_from_mean": st(kernels.deviation_from_mean_kernel, 8, r=8, k=300.0),
        "quantiles": lambda: quantiles(
            synthetic_dem(spark, BENCH_ROWS, BENCH_COLS)).count(),
        "events_hourly": lambda: (
            events.withColumn("hour", F.expr("CAST(CAST(ts AS TIMESTAMP) AS LONG) DIV 3600"))
            .groupBy("hour", "event_type").count().count()),
        "tpch_q1": lambda: (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.count("*")).count()),
    }

    times: dict[str, float] = {}
    for name, fn in bench_queries.items():
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        fn()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"[bench] {name} {times[name]:.2f}s", file=sys.stderr, flush=True)

    total = round(sum(times.values()), 3)
    doc_q = ["pip_join", "knn", "cell_assign", "minhash_signatures",
             "simhash", "ngram_jaccard_top1", "token_stats"]
    tile_q = ["slope", "hillshade", "mean_filter", "dev_from_mean"]
    doc_secs = sum(times[q] for q in doc_q)
    tile_secs = sum(times[q] for q in tile_q)
    result = {
        "metric": "suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": cpus,
        "docs_per_sec": round(n_docs * len(doc_q) / doc_secs, 1),
        "tiles_per_sec": round(n_tiles * len(tile_q) / tile_secs, 2),
        "n_docs": n_docs,
        "n_tiles": n_tiles,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
