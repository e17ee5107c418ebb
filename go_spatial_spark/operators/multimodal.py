"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over `mapInPandas`. The actual codecs
(PIL/ffmpeg/torchaudio) are NOT in this container, so the decode step
is STUBBED: with ``fake=True`` (default) a deterministic fake decoder
produces byte-derived arrays so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested;
with ``fake=False`` the codec boundary raises NotImplementedError.

Schema convention (documents with media):
    media(doc_id long, kind string, payload binary,
          meta struct<width:int, height:int, channels:int,
                      sample_rate:int, n_frames:int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = ("doc_id long, kind string, payload binary, "
                "meta struct<width:int, height:int, channels:int, "
                "sample_rate:int, n_frames:int>")


def synthetic_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: payload =
    doc text bytes (stands in for encoded media), typed metadata from
    doc_id arithmetic. Exercises the binary-column path end to end."""
    kind = F.when(F.col("doc_id") % 3 == 0, "image") \
        .when(F.col("doc_id") % 3 == 1, "audio").otherwise("video")
    meta = F.struct(
        (F.col("doc_id") % 64 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 48 + 16).cast("int").alias("height"),
        F.lit(3).cast("int").alias("channels"),
        F.lit(16000).cast("int").alias("sample_rate"),
        (F.col("doc_id") % 7 + 1).cast("int").alias("n_frames"))
    return docs.select("doc_id", kind.alias("kind"),
                       F.encode("text", "utf-8").alias("payload"),
                       meta.alias("meta"))


def _fake_decode(payload: bytes, width: int, height: int,
                 channels: int) -> np.ndarray:
    """Deterministic stand-in for an image codec: md5-seeded byte
    pattern of the declared shape. Replace with a real decoder
    (PIL.Image.open) in production."""
    seed = hashlib.md5(payload).digest()
    base = np.frombuffer((seed * ((width * height * channels) // 16 + 1)),
                         dtype=np.uint8)[: width * height * channels]
    return base.reshape(height, width, channels)


def decode_and_featurize(media: DataFrame, fake: bool = True) -> DataFrame:
    """media -> per-item features (mean/std per channel, phash-style
    64-bit signature). One Arrow batch per partition; no per-row
    Python outside the (stubbed) codec call."""
    if not fake:
        raise NotImplementedError(
            "real image/audio codecs are not available in this "
            "container; install PIL/ffmpeg and replace _fake_decode")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                m = t.meta
                arr = _fake_decode(bytes(t.payload), int(m["width"]),
                                   int(m["height"]), int(m["channels"]))
                means = arr.mean(axis=(0, 1))
                # 60-bit signature from the coarse 8x8 gray thumbnail
                gray = arr.mean(axis=2)
                th = gray[: (gray.shape[0] // 8) * 8,
                          : (gray.shape[1] // 8) * 8]
                if th.size == 0:
                    sig = 0
                else:
                    blocks = th.reshape(8, th.shape[0] // 8,
                                        8, th.shape[1] // 8).mean(axis=(1, 3))
                    bits = (blocks > np.median(blocks)).ravel()[:60]
                    sig = int(sum(int(b) << i for i, b in enumerate(bits)))
                rows.append((t.doc_id, t.kind, float(means[0]),
                             float(means.mean()), sig))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "kind", "mean_c0", "mean_all", "phash"])

    return media.mapInPandas(
        run, schema=("doc_id long, kind string, mean_c0 double, "
                     "mean_all double, phash long"))


def resize_stub(media: DataFrame, width: int, height: int,
                fake: bool = True) -> DataFrame:
    """Resize plumbing: decode -> (stub) resample -> re-encode bytes.
    Output schema mirrors input (payload replaced)."""
    if not fake:
        raise NotImplementedError("real resize requires PIL/cv2")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            payloads = []
            metas = []
            for t in pdf.itertuples(index=False):
                m = dict(t.meta)
                arr = _fake_decode(bytes(t.payload), int(m["width"]),
                                   int(m["height"]), int(m["channels"]))
                ys = np.linspace(0, arr.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, arr.shape[1] - 1, width).astype(int)
                small = arr[ys][:, xs]
                payloads.append(small.tobytes())
                m["width"], m["height"] = width, height
                metas.append(m)
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 2,
                      fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame."""
    if not fake:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    frames = media.where(F.col("kind") == "video").select(
        "doc_id", "payload", "meta",
        F.explode(F.sequence(
            F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"))
    return frames.select("doc_id", "frame_idx",
                         F.md5(F.concat(
                             F.col("payload").cast("string"),
                             F.col("frame_idx").cast("string"))
                         ).alias("frame_key"))
