"""Focused optimization-round benchmark harness (guide §1.4): times
individual queries against the noop sink so the computation — not the
sink or a count()'s column pruning — is what's measured. bench.py is
FROZEN for driver measurement; this file exists so OPTIMIZATION_r06.md
can cite isolated numbers without touching it.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        ngram_jaccard_top1 knn [--trials 3] [--warmups 1] [--sink noop|count]

Prints one JSON line {"queries": {...}, "sf": ..., "sink": ...}.
Query set mirrors bench.py (same inputs, same cache protocol) plus a
`plan <name>` mode that writes .explain("formatted") to stdout.
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
    RasterMeta, long_to_tiles, run_stencil, synthetic_dem,
)
from go_spatial_spark import kernels  # noqa: E402
from go_spatial_spark.geocode import geocode  # noqa: E402
from go_spatial_spark.operators import (  # noqa: E402
    corpus, dedup, similarity, textstats)
from go_spatial_spark.operators.spatial_join import (  # noqa: E402
    knn_self, point_in_polygon,
)
from go_spatial_spark.operators.window_stats import quantiles  # noqa: E402

BENCH_ROWS, BENCH_COLS, BENCH_TILE = 1024, 1024, 256
BMETA = RasterMeta(rows=BENCH_ROWS, cols=BENCH_COLS)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): a.split("=", 1)[1] if "=" in a
            else True for a in sys.argv[1:] if a.startswith("--")}
    trials = int(opts.get("trials", 3))
    warmups = int(opts.get("warmups", 1))
    sink = opts.get("sink", "count")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("gss-bench-extra", cpus=cpus)
    par = spark.sparkContext.defaultParallelism

    docs = spark.read.parquet(
        f"{sf_dir}/documents.parquet").repartition(par).cache()
    docs.count()
    emb = spark.read.parquet(
        f"{sf_dir}/embeddings.parquet").repartition(par).cache()
    emb.count()
    li = spark.read.parquet(
        f"{sf_dir}/lineitem.parquet").repartition(par).cache()
    li.count()
    dem_tiles = long_to_tiles(
        synthetic_dem(spark, BENCH_ROWS, BENCH_COLS), BMETA,
        tile=BENCH_TILE, with_edges=8).repartition("ty", "tx").cache()
    dem_tiles.count()
    pts = geocode(docs).select("doc_id", "lat", "lon")

    def st(kernel, halo, **extra):
        return lambda: run_stencil(
            dem_tiles, BMETA, kernel, halo=halo, tile=BENCH_TILE,
            ctx_extra=extra or None, output="long", copartitioned=True)

    builders = {
        "pip_join": lambda: point_in_polygon(pts, spark),
        "knn": lambda: knn_self(pts, k=5),
        "cell_assign": lambda: geocode(docs),
        "minhash_signatures": lambda: dedup.minhash_signatures(docs),
        "simhash": lambda: dedup.simhash(docs),
        "ngram_jaccard_top1": lambda: dedup.ngram_jaccard_top1(docs),
        "cosine_topk": lambda: similarity.cosine_topk(emb),
        "ivf_topk": lambda: similarity.ivf_topk(emb),
        "token_stats": lambda: textstats.token_stats(docs),
        "tfidf_topk": lambda: corpus.tfidf_topk(docs),
        "slope": st(kernels.slope_kernel, 1),
        "hillshade": st(kernels.hillshade_kernel, 1),
        "mean_filter": st(kernels.mean_filter_kernel, 2, rx=2, ry=2),
        "dev_from_mean": st(kernels.deviation_from_mean_kernel, 8,
                            r=8, k=300.0),
        "quantiles": lambda: quantiles(
            synthetic_dem(spark, BENCH_ROWS, BENCH_COLS)),
        "events_hourly": lambda: (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .withColumn("hour", F.expr(
                "CAST(CAST(ts AS TIMESTAMP) AS LONG) DIV 3600"))
            .groupBy("hour", "event_type").count()),
        "tpch_q1": lambda: (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.count("*"))),
    }

    if opts.get("plan"):
        # plan mode: print .explain("formatted") for each named query
        for name in args:
            df = builders[name]()
            print(f"===== {name} =====")
            df.explain("formatted")
        return

    ann = {"cosine_topk", "ivf_topk"}
    run = {"noop": noop, "count": lambda df: df.count()}[sink]
    times: dict[str, float] = {}
    trace: dict[str, list[float]] = {}
    for name in args:
        fn = builders[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        rec = trace.setdefault(name, [])
        best = float("inf")
        for i in range(warmups + trials):
            t0 = time.perf_counter()
            run(fn())
            dt = time.perf_counter() - t0
            rec.append(round(dt, 3))
            if i >= warmups:
                best = min(best, dt)
        times[name] = round(best, 3)
        print(f"[extra] {name} {best:.2f}s trials={rec}",
              file=sys.stderr, flush=True)
        if name in ann:
            similarity.release_ann_caches()
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"queries": times, "trace": trace, "sf": sf,
                      "cpus": cpus, "sink": sink}))


if __name__ == "__main__":
    main()
