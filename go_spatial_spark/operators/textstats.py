"""Text-analysis operators over the documents table (training-data
pipeline layer): token counting, quality scoring, language-ID
heuristic, document fingerprinting.

All JVM-side (`pyspark.sql.functions` array/string expressions — no
Python in the hot path), each with a DuckDB-oracle twin built from the
same deterministic expressions.
"""

from __future__ import annotations

from go_spatial_spark.session import ensure_parallelism
from pyspark.sql import DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# deterministic marker-word language heuristic (the *operator* is the
# deliverable; the synthetic corpus is random so accuracy is noise)
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "fr": ("le", "et", "la"),
    "es": ("el", "y", "de"),
    "zh": ("zh",),
}


def _toks(col):
    return F.split(col, " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token count, char count, punct count, stopword count."""
    docs = ensure_parallelism(docs)
    toks = _toks(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return docs.select(
        "doc_id", "lang",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("len_chars"),
        (F.length("text")
         - F.length(F.regexp_replace("text", r"[\.,;:!\?]", ""))
         ).alias("n_punct"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))
               ).alias("n_stop"),
    )


def token_stats_oracle_sql(docs_tbl: str = "documents") -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS len_chars,
           length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))
             AS n_punct,
           len(list_filter(string_split(text, ' '),
                           t -> t IN ({stop}))) AS n_stop
    FROM {docs_tbl}
    """


def text_metrics(docs: DataFrame, shingle: int = 8) -> DataFrame:
    """Per-doc text metrics in ONE projection: token/char/punct/stop
    counts (token_stats), marker-word language ID (lang_id) and the
    min-md5 8-gram fingerprint (fingerprint) — the three per-doc text
    operators fused into a single scan so the correctness gate checks
    all of them in one driver row without tripling the table scans.
    Docs shorter than the shingle get fingerprint '' (the standalone
    operator filters them out instead)."""
    docs = ensure_parallelism(docs)
    toks = _toks(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])

    def marker_count(ws):
        arr = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    langs = list(LANG_MARKERS)
    scores = {lg: marker_count(ws) for lg, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    fp = F.expr(
        f"array_min(transform(sequence(1, length(text) - {shingle - 1}),"
        f" i -> md5(substring(text, i, {shingle}))))")
    return docs.select(
        "doc_id", "lang",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("len_chars"),
        (F.length("text")
         - F.length(F.regexp_replace("text", r"[\.,;:!\?]", ""))
         ).alias("n_punct"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))
               ).alias("n_stop"),
        pred.alias("lang_pred"),
        (pred == F.col("lang")).alias("correct"),
        F.when(F.length("text") >= shingle, fp).otherwise(F.lit(""))
        .alias("fingerprint"))


def text_metrics_oracle_sql(docs_tbl: str = "documents",
                            shingle: int = 8) -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    score_exprs = []
    for lg, ws in LANG_MARKERS.items():
        inlist = ", ".join(f"'{w}'" for w in ws)
        score_exprs.append(
            f"len(list_filter(string_split(text, ' '), "
            f"t -> t IN ({inlist}))) AS s_{lg}")
    langs = list(LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lg} = {greatest} THEN '{lg}'" for lg in langs) + " END"
    return f"""
    WITH s AS (SELECT doc_id, lang, text, {', '.join(score_exprs)}
               FROM {docs_tbl})
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS len_chars,
           length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g'))
             AS n_punct,
           len(list_filter(string_split(text, ' '),
                           t -> t IN ({stop}))) AS n_stop,
           {case} AS lang_pred,
           ({case}) = lang AS correct,
           CASE WHEN length(text) >= {shingle}
                THEN list_min(list_transform(
                       range(1, length(text) - {shingle - 2}),
                       i -> md5(substring(text, i, {shingle}))))
                ELSE '' END AS fingerprint
    FROM s
    """


def quality_score(docs: DataFrame) -> DataFrame:
    """Aggregate quality stats per (lang, source): doc counts, token
    sums, stopword ratio. Integer sums -> exact cross-engine."""
    # single row-wise projection (token stats + source together): a
    # token_stats(docs) ⋈ docs join would shuffle two derivations of
    # the same scan on doc_id — pure waste at corpus scale
    toks = _toks(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    t = docs.select(
        "lang", "source",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("len_chars"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))
               ).alias("n_stop"))
    return (t.groupBy("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("sum_tokens"),
                 F.sum("len_chars").alias("sum_chars"),
                 F.sum("n_stop").alias("sum_stop"),
                 (F.sum("n_stop").cast("double")
                  / F.sum("n_tokens").cast("double")).alias("stop_ratio")))


def quality_score_oracle_sql(docs_tbl: str = "documents") -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) AS len_chars,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ({stop}))) AS n_stop
      FROM {docs_tbl})
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(len_chars) AS BIGINT) AS sum_chars,
           CAST(sum(n_stop) AS BIGINT) AS sum_stop,
           CAST(sum(n_stop) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)
             AS stop_ratio
    FROM t GROUP BY lang, source
    """


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax over per-language marker hit
    counts, ties broken by language code order."""
    docs = ensure_parallelism(docs)
    toks = _toks(F.col("text"))

    def marker_count(ws):
        arr = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scored = docs.select("doc_id", "lang", *[
        marker_count(ws).alias(f"s_{lg}")
        for lg, ws in LANG_MARKERS.items()])
    langs = list(LANG_MARKERS)
    # argmax with tie-break = first language (alphabetical scan order)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):
        pred = F.when(F.col(f"s_{lg}") == best, F.lit(lg)).otherwise(pred)
    return scored.select(
        "doc_id", "lang", pred.alias("lang_pred"),
        (pred == F.col("lang")).alias("correct"))


def lang_id_oracle_sql(docs_tbl: str = "documents") -> str:
    score_exprs = []
    for lg, ws in LANG_MARKERS.items():
        inlist = ", ".join(f"'{w}'" for w in ws)
        score_exprs.append(
            f"len(list_filter(string_split(text, ' '), "
            f"t -> t IN ({inlist}))) AS s_{lg}")
    langs = list(LANG_MARKERS)
    greatest = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN s_{lg} = {greatest} THEN '{lg}'" for lg in langs) + " END"
    return f"""
    WITH s AS (SELECT doc_id, lang, {', '.join(score_exprs)} FROM {docs_tbl})
    SELECT doc_id, lang, {case} AS lang_pred,
           ({case}) = lang AS correct
    FROM s
    """


def fingerprint(docs: DataFrame, shingle: int = 8) -> DataFrame:
    """Document fingerprint: min over md5 of character 8-grams (the
    rolling-hash/winnowing family, min-sampled to one fingerprint)."""
    docs = ensure_parallelism(docs)
    return (docs
            .where(F.length("text") >= shingle)
            .select("doc_id",
                    F.expr(f"array_min(transform(sequence(1, length(text) - {shingle - 1}),"
                           f" i -> md5(substring(text, i, {shingle}))))"
                           ).alias("fingerprint")))


def fingerprint_oracle_sql(docs_tbl: str = "documents",
                           shingle: int = 8) -> str:
    return f"""
    SELECT doc_id,
           list_min(list_transform(range(1, length(text) - {shingle - 2}),
                    i -> md5(substring(text, i, {shingle})))) AS fingerprint
    FROM {docs_tbl} WHERE length(text) >= {shingle}
    """
