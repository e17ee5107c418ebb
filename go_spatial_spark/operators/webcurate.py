"""Web-corpus curation operators over the input_hint page shape
(url, warc_ts, html, text, lang — pipeline.wrap_html): the domain-level
bookkeeping a Common-Crawl-style training-data pipeline runs after
extraction and before tokenization.

All three are pure Catalyst plans (no Python in the hot path):

* ``host_stats`` — per-host corpus accounting (URL parsing + agg); at
  10^12 docs this is the partial-agg + single shuffle on host.
* ``quota_sample`` — deterministic hash-based quota sampling per doc
  (md5 of text -> [0,100) bucket), the reproducible alternative to
  ``df.sample`` for corpus downsampling: re-runs and engines agree on
  the kept set, so downstream shards are stable.
* ``host_quality_filter`` — C4-style domain filtering: aggregate a
  per-host signal (stopword-token ratio), then semi-join the doc table
  against the passing hosts. The host dim is tiny (#hosts << #docs) so
  it broadcasts; the doc side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from go_spatial_spark.pipeline import wrap_html

_HOST_RE = r"^https://([^/]+)/"

# url reconstruction in DuckDB (mirrors pipeline.wrap_html)
_URL_SQL = ("'https://host' || CAST(doc_id % 13 AS VARCHAR) || "
            "'.example/p/' || CAST(doc_id AS VARCHAR)")


def host_stats(docs: DataFrame) -> DataFrame:
    """Per-host accounting: doc count, char volume, language spread."""
    pages = wrap_html(docs)
    host = F.regexp_extract("url", _HOST_RE, 1)
    return (pages.select(host.alias("host"), "text", "lang")
            .groupBy("host")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length("text")).alias("sum_chars"),
                 F.countDistinct("lang").alias("n_langs")))


def host_stats_oracle_sql(docs_tbl: str = "documents") -> str:
    return f"""
    SELECT regexp_extract({_URL_SQL}, '{_HOST_RE}', 1) AS host,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           count(DISTINCT lang) AS n_langs
    FROM {docs_tbl} GROUP BY 1
    """


def _md5_bucket(col, buckets: int = 100):
    """Deterministic [0,buckets) assignment from md5(text) — identical
    across Spark and DuckDB (unlike engine-native hash functions)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10) \
        .cast("long") % buckets


def quota_sample(docs: DataFrame, quotas: dict[str, int] | None = None,
                 default_quota: int = 10) -> DataFrame:
    """Keep a per-language percentage quota of documents, chosen by a
    content hash (reproducible sampling). quotas maps lang -> percent
    kept (0..100)."""
    quotas = quotas or {"en": 50, "de": 25}
    bucket = _md5_bucket(F.col("text"))
    quota = F.lit(default_quota)
    for lang, pct in sorted(quotas.items()):
        quota = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(quota)
    return (docs.withColumn("bucket", bucket.cast("int"))
            .where(F.col("bucket") < quota)
            .select("doc_id", "lang", "bucket"))


def quota_sample_oracle_sql(docs_tbl: str = "documents",
                            quotas: dict[str, int] | None = None,
                            default_quota: int = 10) -> str:
    quotas = quotas or {"en": 50, "de": 25}
    cases = " ".join(f"WHEN lang = '{k}' THEN {v}"
                     for k, v in sorted(quotas.items()))
    return f"""
    WITH b AS (
      SELECT doc_id, lang,
             CAST(('0x' || substring(md5(text), 1, 8))::UBIGINT % 100
                  AS INT) AS bucket
      FROM {docs_tbl})
    SELECT doc_id, lang, bucket FROM b
    WHERE bucket < (CASE {cases} ELSE {default_quota} END)
    """


def host_quality_filter(docs: DataFrame,
                        min_stop_ratio: float = 0.05) -> DataFrame:
    """Domain-level quality gate: keep documents whose host's aggregate
    stopword-token ratio is >= min_stop_ratio. The per-host aggregate
    is tiny -> broadcast semi-join against the doc table (doc side
    stays shuffle-free)."""
    from go_spatial_spark.operators.textstats import STOPWORDS, _toks
    # one row-wise projection computes host + token stats together —
    # joining token_stats(docs) back to wrap_html(docs) on doc_id
    # would be a doc-x-doc shuffle join of two derivations of the same
    # scan; this way the doc table is only ever map-side
    toks = _toks(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    pages = wrap_html(docs).select(
        "doc_id", F.regexp_extract("url", _HOST_RE, 1).alias("host"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))
               ).alias("n_stop"))
    hosts = (pages.groupBy("host")
             .agg((F.sum("n_stop").cast("double")
                   / F.sum("n_tokens").cast("double"))
                  .alias("host_stop_ratio"))
             .where(F.col("host_stop_ratio") >= F.lit(min_stop_ratio)))
    return (pages.join(F.broadcast(hosts), "host")
            .select("doc_id", "host",
                    F.round("host_stop_ratio", 6).alias("host_stop_ratio")))


def host_quality_filter_oracle_sql(docs_tbl: str = "documents",
                                   min_stop_ratio: float = 0.05) -> str:
    from go_spatial_spark.operators.textstats import STOPWORDS
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH pages AS (
      SELECT doc_id,
             regexp_extract({_URL_SQL}, '{_HOST_RE}', 1) AS host,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ({stop}))) AS n_stop
      FROM {docs_tbl}),
    hosts AS (
      SELECT host,
             CAST(sum(n_stop) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)
               AS host_stop_ratio
      FROM pages GROUP BY host
      HAVING host_stop_ratio >= {min_stop_ratio})
    SELECT p.doc_id, p.host, round(h.host_stop_ratio, 6)
             AS host_stop_ratio
    FROM pages p JOIN hosts h USING (host)
    """
