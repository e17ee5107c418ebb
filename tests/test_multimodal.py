"""Multimodal binary-column plumbing (stubbed codecs)."""

import pytest

from go_spatial_spark.operators import multimodal as MM


def test_decode_featurize_deterministic(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    media = MM.synthetic_media(spark, docs)
    f1 = MM.decode_and_featurize(media).orderBy("doc_id").toPandas()
    f2 = MM.decode_and_featurize(media).orderBy("doc_id").toPandas()
    assert len(f1) == docs.count()
    assert (f1["phash"] == f2["phash"]).all()
    assert (f1["mean_all"] == f2["mean_all"]).all()


def test_resize_changes_meta(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet").limit(20)
    media = MM.synthetic_media(spark, docs)
    small = MM.resize_stub(media, 8, 8).toPandas()
    assert (small["meta"].map(lambda m: (m["width"], m["height"]))
            == (8, 8)).all()
    assert small["payload"].map(len).eq(8 * 8 * 3).all()


def test_frame_sample(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    media = MM.synthetic_media(spark, docs)
    frames = MM.frame_sample_stub(media, every_n=2).toPandas()
    assert len(frames) > 0
    assert (frames["frame_idx"] % 2 == 0).all()


def test_real_codec_path_is_marked(spark, sf001):
    docs = spark.read.parquet(f"{sf001}/documents.parquet").limit(1)
    media = MM.synthetic_media(spark, docs)
    with pytest.raises(NotImplementedError):
        MM.decode_and_featurize(media, fake=False)
