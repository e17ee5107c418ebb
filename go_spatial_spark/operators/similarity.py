"""Similarity search over the embeddings table (array<float>, 64-dim).

- brute-force cosine top-k: the exactness baseline. Dot products are
  computed as a *left fold* (F.aggregate) so the summation order is
  fixed and identical to the DuckDB oracle's list_reduce — bit-equal
  doubles, deterministic ranking.
- IVF-bucketed ANN: deterministic coarse quantizer (the first C
  vectors by vec_id are the centroids — no kmeans nondeterminism),
  nprobe buckets searched. Approximate by design but fully
  deterministic, so it also gets an exact oracle.

At scale the brute-force path is the broadcast side of a cross join
(queries broadcast, corpus partitioned); IVF turns that into an
equi-join on bucket id — the shuffle-light path.
"""

from __future__ import annotations

from go_spatial_spark.session import ensure_parallelism
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    """Left-fold dot product with fixed order: identical in DuckDB's
    list_reduce (0.0 + e1 + e2 ... in element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm2(a):
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


import numpy as np
import pandas as pd
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def _dot_fold_arrow(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized exact left-fold dot product: NumPy cumsum is
    sequential, so the result is bit-identical to F.aggregate's
    (((0+e1)+e2)+...) and to DuckDB's list_reduce — but ~100x faster
    than Catalyst's interpreted higher-order aggregate."""
    am = np.stack(a.to_numpy()).astype(np.float64)
    bm = np.stack(b.to_numpy()).astype(np.float64)
    prod = am * bm
    return pd.Series(np.cumsum(prod, axis=1)[:, -1])


@F.pandas_udf(T.DoubleType())
def _norm_fold_arrow(a: pd.Series) -> pd.Series:
    am = np.stack(a.to_numpy()).astype(np.float64)
    sq = am * am
    return pd.Series(np.sqrt(np.cumsum(sq, axis=1)[:, -1]))


_DOT_SQL = ("list_reduce(list_transform(list_zip({a}, {b}), "
            "__p -> CAST(__p[1] AS DOUBLE) * CAST(__p[2] AS DOUBLE)), "
            "(__x, __y) -> __x + __y)")
_NORM2_SQL = ("list_reduce(list_transform({a}, "
              "__e -> CAST(__e AS DOUBLE) * CAST(__e AS DOUBLE)), "
              "(__x, __y) -> __x + __y)")


def cosine_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """Exact self top-k by cosine similarity (vec_id, neighbor_id,
    rank, cos). Ties broken by neighbor id; cos is bit-deterministic.

    Physical plan: the corpus matrix is a Spark broadcast (the classic
    brute-force ANN shape — queries partitioned, corpus replicated);
    each partition computes its query-block cosines in NumPy with a
    *sequential* fold over the feature axis (acc += q_k * c_k in
    element order), so every dot product is bit-identical to the SQL
    oracle's list_reduce left fold. Top-k via per-row lexsort on
    (-cos, nid) keeps the deterministic tie-break."""
    emb = ensure_parallelism(emb)
    spark = emb.sparkSession
    corpus_pdf = emb.select("vec_id", "embedding").toPandas()
    c_ids = corpus_pdf["vec_id"].to_numpy()
    c_mat = np.stack(corpus_pdf["embedding"].to_numpy()).astype(np.float64)
    c_norm = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_norm))

    def solve(it):
        ids, cm, cn = bc.value
        n = cm.shape[0]
        d = cm.shape[1]
        for pdf in it:
            if pdf.empty:
                continue
            qids = pdf["vec_id"].to_numpy()
            qm = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qn = np.sqrt(np.cumsum(qm * qm, axis=1)[:, -1])
            # sequential left-fold dot: acc built feature-by-feature
            acc = np.zeros((qm.shape[0], n))
            for kk in range(d):
                acc += qm[:, kk:kk + 1] * cm[None, :, kk].reshape(1, n)
            cos = acc / (qn[:, None] * cn[None, :])
            rows = []
            for i in range(qm.shape[0]):
                mask = ids != qids[i]
                order = np.lexsort((ids[mask], -cos[i, mask]))[:k]
                cand_ids = ids[mask][order]
                cand_cos = cos[i, mask][order]
                for r, (nid, cv) in enumerate(zip(cand_ids, cand_cos), 1):
                    rows.append((int(qids[i]), int(nid), r, float(cv)))
            yield pd.DataFrame(rows, columns=["vec_id", "neighbor_id",
                                              "rank", "cos"])

    return emb.select("vec_id", "embedding").mapInPandas(
        solve, schema="vec_id long, neighbor_id long, rank int, cos double")


def cosine_topk_oracle_sql(emb_tbl: str = "embeddings", k: int = 5) -> str:
    dot = _DOT_SQL.format(a="q.embedding", b="c.embedding")
    nq = _NORM2_SQL.format(a="q.embedding")
    nc = _NORM2_SQL.format(a="c.embedding")
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS vec_id, c.vec_id AS neighbor_id,
             {dot} / (sqrt({nq}) * sqrt({nc})) AS cos
      FROM {emb_tbl} q JOIN {emb_tbl} c ON q.vec_id <> c.vec_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      FROM scored)
    SELECT vec_id, neighbor_id, CAST(rank AS INT) AS rank, cos
    FROM ranked WHERE rank <= {k}
    """


def ivf_topk(emb: DataFrame, k: int = 5, n_centroids: int = 16,
             nprobe: int = 2) -> DataFrame:
    """IVF ANN: centroids = embeddings of the n_centroids smallest
    vec_ids; every vector is assigned to its nearest centroid; queries
    probe their nprobe nearest buckets. Assignment runs as one
    broadcast-centroids mapInPandas pass (fold order preserved);
    bucket search is an equi-join on centroid id with per-vector
    precomputed norms — the shuffle-light ANN shape."""
    emb = ensure_parallelism(emb)
    spark = emb.sparkSession
    cents_pdf = (emb.orderBy("vec_id").limit(n_centroids)
                 .select("vec_id", "embedding").toPandas())
    c_ids = cents_pdf["vec_id"].to_numpy()
    c_mat = np.stack(cents_pdf["embedding"].to_numpy()).astype(np.float64)
    c_norm = np.sqrt(np.cumsum(c_mat * c_mat, axis=1)[:, -1])
    bc = spark.sparkContext.broadcast((c_ids, c_mat, c_norm))

    def assign(it):
        ids, cm, cn = bc.value
        d = cm.shape[1]
        for pdf in it:
            if pdf.empty:
                continue
            vm = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            vn = np.sqrt(np.cumsum(vm * vm, axis=1)[:, -1])
            acc = np.zeros((vm.shape[0], cm.shape[0]))
            for kk in range(d):
                acc += vm[:, kk:kk + 1] * cm[None, :, kk].reshape(1, -1)
            cos = acc / (vn[:, None] * cn[None, :])
            rows = []
            for i in range(vm.shape[0]):
                order = np.lexsort((ids, -cos[i]))[:nprobe]
                for r, j in enumerate(order, 1):
                    rows.append((int(pdf["vec_id"].iloc[i]),
                                 pdf["embedding"].iloc[i],
                                 int(ids[j]), r, float(vn[i])))
            yield pd.DataFrame(rows, columns=["vec_id", "embedding",
                                              "cid", "arn", "norm"])

    ranked = emb.select("vec_id", "embedding").mapInPandas(
        assign, schema=("vec_id long, embedding array<float>, cid long, "
                        "arn int, norm double")).cache()
    buckets = ranked.where(F.col("arn") == 1).select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"),
        "cid", F.col("norm").alias("nn"))
    probes = ranked.where(F.col("arn") <= nprobe).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        "cid", F.col("norm").alias("qn"))

    # per-bucket matrix scoring (one cogroup per centroid id): the
    # per-bucket local top-k is a superset of each query's global
    # top-k contribution from that bucket, so the final window merge
    # over <= nprobe*k rows per query is exact
    def bucket_score(key, probe_pdf, member_pdf):
        if probe_pdf.empty or member_pdf.empty:
            return pd.DataFrame({"qid": pd.Series(dtype="int64"),
                                 "nid": pd.Series(dtype="int64"),
                                 "cos": pd.Series(dtype="float64")})
        qm = np.stack(probe_pdf["qe"].to_numpy()).astype(np.float64)
        qn = probe_pdf["qn"].to_numpy()
        qids = probe_pdf["qid"].to_numpy()
        nm = np.stack(member_pdf["ne"].to_numpy()).astype(np.float64)
        nn = member_pdf["nn"].to_numpy()
        nids = member_pdf["nid"].to_numpy()
        acc = np.zeros((qm.shape[0], nm.shape[0]))
        for kk in range(qm.shape[1]):
            acc += qm[:, kk:kk + 1] * nm[None, :, kk].reshape(1, -1)
        cos = acc / (qn[:, None] * nn[None, :])
        rows = []
        for i in range(qm.shape[0]):
            mask = nids != qids[i]
            order = np.lexsort((nids[mask], -cos[i, mask]))[:k]
            for j in order:
                rows.append((int(qids[i]), int(nids[mask][j]),
                             float(cos[i, mask][j])))
        return pd.DataFrame(rows, columns=["qid", "nid", "cos"])

    scored = (probes.groupBy("cid").cogroup(buckets.groupBy("cid"))
              .applyInPandas(bucket_score,
                             schema="qid long, nid long, cos double")
              .distinct())
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(F.col("qid").alias("vec_id"),
                    F.col("nid").alias("neighbor_id"),
                    F.col("rank").cast("int").alias("rank"), "cos"))


def ivf_topk_oracle_sql(emb_tbl: str = "embeddings", k: int = 5,
                        n_centroids: int = 16, nprobe: int = 2) -> str:
    dot_ec = _DOT_SQL.format(a="e.embedding", b="c.ce")
    ne_ = _NORM2_SQL.format(a="e.embedding")
    nc_ = _NORM2_SQL.format(a="c.ce")
    dot_qn = _DOT_SQL.format(a="q.qe", b="n.ne")
    nq2 = _NORM2_SQL.format(a="q.qe")
    nn2 = _NORM2_SQL.format(a="n.ne")
    return f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS ce FROM {emb_tbl}
      ORDER BY vec_id LIMIT {n_centroids}),
    assign_all AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {dot_ec} / (sqrt({ne_}) * sqrt({nc_})) AS cc
      FROM {emb_tbl} e CROSS JOIN cents c),
    ranked_a AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS arn
      FROM assign_all),
    buckets AS (
      SELECT vec_id AS nid, embedding AS ne, cid FROM ranked_a WHERE arn = 1),
    probes AS (
      SELECT vec_id AS qid, embedding AS qe, cid FROM ranked_a
      WHERE arn <= {nprobe}),
    scored AS (
      SELECT DISTINCT q.qid, n.nid,
             {dot_qn} / (sqrt({nq2}) * sqrt({nn2})) AS cos
      FROM probes q JOIN buckets n ON q.cid = n.cid AND q.qid <> n.nid),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank FROM scored)
    SELECT qid AS vec_id, nid AS neighbor_id, CAST(rank AS INT) AS rank, cos
    FROM ranked WHERE rank <= {k}
    """


def cosine_near_dup(emb: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold)
    — the embedding leg of the dedup family."""
    emb = ensure_parallelism(emb)
    q = emb.select(F.col("vec_id").alias("a"),
                   F.col("embedding").alias("qe"),
                   _norm_fold_arrow("embedding").alias("qn"))
    c = emb.select(F.col("vec_id").alias("b"),
                   F.col("embedding").alias("ne"),
                   _norm_fold_arrow("embedding").alias("nn"))
    pairs = q.crossJoin(c).where(F.col("a") < F.col("b"))
    cos = _dot_fold_arrow(F.col("qe"), F.col("ne")) / (F.col("qn") * F.col("nn"))
    return (pairs.select("a", "b", cos.alias("cos"))
            .where(F.col("cos") >= threshold))


def cosine_near_dup_oracle_sql(emb_tbl: str = "embeddings",
                               threshold: float = 0.35) -> str:
    dot = _DOT_SQL.format(a="q.embedding", b="c.embedding")
    nq = _NORM2_SQL.format(a="q.embedding")
    nc = _NORM2_SQL.format(a="c.embedding")
    return f"""
    SELECT q.vec_id AS a, c.vec_id AS b,
           {dot} / (sqrt({nq}) * sqrt({nc})) AS cos
    FROM {emb_tbl} q JOIN {emb_tbl} c ON q.vec_id < c.vec_id
    WHERE {dot} / (sqrt({nq}) * sqrt({nc})) >= {threshold}
    """


# ---------------------------------------------------------------------------
# Random-hyperplane LSH over embeddings (SimHash-for-vectors ANN)
# ---------------------------------------------------------------------------

LSH_PLANES = 32
LSH_PER_BAND = 8  # -> 4 bands of 8 bits


def _plane_weight_spark(dim: int) -> str:
    """Deterministic hyperplane entry w(j, d) as an exact dyadic
    rational — an LCG-style hash mapped to [-0.5, 0.5). All integer
    intermediates stay < 2^53 so double and int64 agree; the identical
    expression is emitted for DuckDB, so dot products (fixed fold
    order) are bit-equal and the bucket bits match exactly."""
    return (f"(CAST(((j * {dim} + d) * 2654435761) % 2147483648 AS DOUBLE)"
            f" / 2147483648.0 - 0.5)")


def embed_lsh_pairs(emb: DataFrame, n_planes: int = LSH_PLANES,
                    per_band: int = LSH_PER_BAND,
                    dim: int = 64) -> DataFrame:
    """ANN candidate pairs by random-hyperplane LSH: bit_j =
    sign(<x, H_j>), bits grouped into bands of `per_band`; vectors
    sharing any full band signature are candidates (a, b), a < b.

    Plan shape: explode(plane index) -> fold dot (fixed order) ->
    groupBy(vec, band) bit-pack -> self equi-join on (band, sig) —
    the shuffle-light bucketed ANN path (same shape as MinHash LSH);
    at scale the join key space is dense enough that AQE handles any
    hot bucket."""
    emb = ensure_parallelism(emb)
    w = _plane_weight_spark(dim)
    dot = F.expr(
        "aggregate(zip_with(embedding, sequence(0, size(embedding) - 1), "
        f"(x, d) -> CAST(x AS DOUBLE) * {w}), "
        "0.0D, (acc, v) -> acc + v)")
    bits = (emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("j"),
        "embedding")
        .select("vec_id", "j", (dot >= 0).cast("long").alias("bit")))
    sigs = (bits
            .groupBy("vec_id",
                     F.expr(f"j div {per_band}").cast("int").alias("band"))
            .agg(F.sum(F.expr(
                f"shiftleft(bit, CAST(j % {per_band} AS INT))"))
                .alias("sig")))
    left = sigs.select(F.col("vec_id").alias("a"), "band", "sig")
    right = sigs.select(F.col("vec_id").alias("b"), "band", "sig")
    return (left.join(right, ["band", "sig"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def embed_lsh_pairs_oracle_sql(emb_tbl: str = "embeddings",
                               n_planes: int = LSH_PLANES,
                               per_band: int = LSH_PER_BAND,
                               dim: int = 64) -> str:
    # DuckDB's indexed lambda is 1-based -> d = i - 1
    w = (f"(CAST((((j * {dim}) + (i - 1)) * 2654435761) % 2147483648 "
         f"AS DOUBLE) / 2147483648.0 - 0.5)")
    return f"""
    WITH planes AS (SELECT range AS j FROM range(0, {n_planes})),
    dots AS (
      SELECT e.vec_id, p.j,
             list_reduce(list_transform(e.embedding,
               (x, i) -> CAST(x AS DOUBLE) * {w}),
               (__a, __b) -> __a + __b) AS dot
      FROM {emb_tbl} e CROSS JOIN planes p),
    sigs AS (
      SELECT vec_id, CAST(j // {per_band} AS INT) AS band,
             SUM((CASE WHEN dot >= 0 THEN 1 ELSE 0 END)
                 << CAST(j % {per_band} AS INT)) AS sig
      FROM dots GROUP BY vec_id, CAST(j // {per_band} AS INT)),
    pairs AS (
      SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
      FROM sigs l JOIN sigs r ON l.band = r.band AND l.sig = r.sig
      WHERE l.vec_id < r.vec_id)
    SELECT a, b FROM pairs
    """
