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


def test_ppm_codec_roundtrip():
    """Real PPM (P6) encode/decode round-trip, plus spec details:
    comment lines and header whitespace."""
    import numpy as np
    from go_spatial_spark.operators.multimodal import (
        decode_ppm, encode_ppm)
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, size=(19, 31, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    # comment + multi-whitespace header per netpbm spec
    body = arr.tobytes()
    hdr = b"P6\n# a comment\n 31\t19\n# another\n255\n"
    assert np.array_equal(decode_ppm(hdr + body), arr)


def test_ppm_featurize_matches_fake(spark):
    """The REAL PPM decode path yields bit-identical features to the
    fake-decode path (payload pixel planes are identical by
    construction) — fake=False end to end."""
    from go_spatial_spark.operators import multimodal
    docs = spark.createDataFrame(
        [(i, f"doc text {i} " * (i % 5 + 1)) for i in range(60)],
        "doc_id long, text string")
    fake = multimodal.decode_and_featurize(
        multimodal.synthetic_media(spark, docs)).drop("kind")
    real = multimodal.decode_and_featurize(
        multimodal.synthetic_ppm_media(spark, docs),
        fake=False, codec="ppm").drop("kind")
    a = {tuple(r) for r in fake.collect()}
    b = {tuple(r) for r in real.collect()}
    assert a == b and len(a) == 60


def test_wav_codec_roundtrip():
    import numpy as np

    from go_spatial_spark.operators.multimodal import (
        decode_wav, encode_wav)
    s = np.array([[0, -32768], [32767, 5], [-1, 1]], dtype=np.int16)
    arr, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100
    assert np.array_equal(arr, s)
    # chunk walker: a LIST chunk before fmt /data must be skipped
    import struct
    raw = encode_wav(s[:, :1], 8000)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = raw[:12] + extra + raw[12:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8) + patched[8:]
    arr2, rate2 = decode_wav(patched)
    assert rate2 == 8000 and np.array_equal(arr2, s[:, :1])


def test_wav_rejects_non_pcm16():
    import struct

    import numpy as np
    import pytest

    from go_spatial_spark.operators.multimodal import (
        decode_wav, encode_wav)
    raw = bytearray(encode_wav(np.zeros(8, dtype=np.int16), 8000))
    raw[20:22] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(raw))


def test_wav_featurize_values(spark, sf001):
    from go_spatial_spark.operators.multimodal import (
        audio_featurize, synthetic_wav_media)
    docs = spark.read.parquet(f"{sf001}/documents.parquet").limit(10)
    out = audio_featurize(synthetic_wav_media(spark, docs)).collect()
    assert len(out) == 10
    for r in out:
        assert r.n_samples == r.doc_id % 2048 + 256
        assert r.sample_rate == 16000
        assert 0 <= r.peak_amp <= 32768
        assert 0 <= r.zero_crossings < r.n_samples
