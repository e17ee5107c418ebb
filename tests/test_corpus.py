"""Semantic tests for corpus-level analytics (tfidf / decontamination
/ repetition) — the driver-parity twin lives in test_oracle_parity.py;
these check the *behavioral* contracts on constructed inputs."""

import pytest
from pyspark.sql import Row

from go_spatial_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in rows])


def test_tfidf_prefers_rare_tokens(spark):
    # 'rare' appears once in one doc; 'common' in every doc. The top
    # tfidf token of doc 0 must be 'rare' (tf equal, df 1 vs 3).
    docs = _docs(spark, [(0, "common rare common"),
                         (1, "common x common"),
                         (2, "common y common")])
    top = {r.doc_id: r.token
           for r in corpus.tfidf_topk(docs, k=1).collect()}
    assert top[0] == "rare"
    assert top[1] == "x" and top[2] == "y"


def test_tfidf_k_and_tiebreak(spark):
    docs = _docs(spark, [(0, "b a b a"), (1, "c c d d")])
    out = corpus.tfidf_topk(docs, k=2).collect()
    assert all(r.rank <= 2 for r in out)
    # doc 0: a and b tie on (tf=2, df=1) -> token asc breaks the tie
    d0 = sorted([r for r in out if r.doc_id == 0], key=lambda r: r.rank)
    assert [r.token for r in d0] == ["a", "b"]


def test_decontaminate_flags_probe_duplicate(spark):
    # doc 97*1=97 is a probe; doc 5 copies it verbatim -> overlap 1.0;
    # doc 6 shares nothing. Probe docs themselves are excluded.
    probe_text = "alpha beta gamma delta epsilon zeta"
    docs = _docs(spark, [(97, probe_text),
                         (5, probe_text),
                         (6, "one two three four five six")])
    out = {r.doc_id: r for r in corpus.decontaminate(docs).collect()}
    assert 97 not in out
    assert out[5].overlap_frac == 1.0 and out[5].contaminated
    assert out[6].overlap_frac == 0.0 and not out[6].contaminated


def test_decontaminate_partial_overlap(spark):
    # doc shares exactly its first 3-gram with the probe: 'p q r'
    # (doc_id 0 would itself be a probe — 0 % PROBE_MOD == 0)
    docs = _docs(spark, [(1, "p q r zz yy xx"),
                         (97, "p q r s")])
    out = {r.doc_id: r for r in corpus.decontaminate(docs).collect()}
    # doc 1 grams: p q r / q r zz / r zz yy / zz yy xx -> 1/4 overlap
    # ('q r s' and 'p q r' both in probe; only 'p q r' shared)
    assert out[1].n_grams == 4
    assert out[1].n_overlap == 1
    assert out[1].overlap_frac == pytest.approx(0.25)


def test_repetition_stats_extremes(spark):
    docs = _docs(spark, [(0, "x x x x"),          # all repeats
                         (1, "a b c d"),          # no repeats
                         (2, "a b a b")])         # alternating
    out = {r.doc_id: r for r in corpus.repetition_stats(docs).collect()}
    assert out[0].dup_word_frac == pytest.approx(3 / 4)
    assert out[0].top_word_frac == pytest.approx(1.0)
    assert out[0].dup_2gram_frac == pytest.approx(2 / 3)  # 'x x' x3
    assert out[1].dup_word_frac == 0.0
    assert out[1].dup_2gram_frac == 0.0
    # doc 2: grams 'a b','b a','a b' -> (3-2)/3
    assert out[2].dup_word_frac == pytest.approx(0.5)
    assert out[2].dup_2gram_frac == pytest.approx(1 / 3)


def test_repetition_single_token_doc(spark):
    # one token: no 2-grams -> dup_2gram_frac coalesces to 0, row kept
    docs = _docs(spark, [(0, "solo")])
    out = corpus.repetition_stats(docs).collect()
    assert len(out) == 1
    assert out[0].dup_2gram_frac == 0.0


def test_pack_shards_sequential_budget(spark):
    docs = _docs(spark, [(0, "a b c"), (1, "d e"), (2, "f g h i"),
                         (3, "j")])
    out = {r.doc_id: r.shard_id
           for r in corpus.pack_shards(docs, tokens_per_shard=5)
           .collect()}
    # cum-starts: 0,3,5,9 -> shards 0,0,1,1
    assert out == {0: 0, 1: 0, 2: 1, 3: 1}


def test_pack_shards_monotone(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    rows = (corpus.pack_shards(docs, tokens_per_shard=1000)
            .orderBy("doc_id").collect())
    sid = [r.shard_id for r in rows]
    assert sid == sorted(sid)  # shard ids never go backwards
    assert sid[0] == 0


def test_split_is_content_stable(spark):
    # same text -> same split regardless of doc_id
    docs = _docs(spark, [(1, "stable content here"),
                         (99999, "stable content here")])
    out = corpus.train_val_test_split(docs).collect()
    assert len({r.split for r in out}) == 1
    assert len({r.bucket for r in out}) == 1
