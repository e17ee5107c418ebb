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


# --- real codec: PPM (P6), pure NumPy ------------------------------------
# One genuinely real decode path behind the codec boundary: binary PPM
# is a public one-header-line-per-field format (netpbm spec), so the
# container's no-PIL/ffmpeg constraint doesn't apply. PNG/JPEG remain
# honest NotImplementedError stubs.

def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = arr.shape
    assert c == 3, "P6 is 3-channel"
    return (f"P6\n{w} {h}\n255\n".encode()
            + np.ascontiguousarray(arr, dtype=np.uint8).tobytes())


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8. Handles whitespace/comment
    tokens per the netpbm spec."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("16-bit PPM not supported")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=i).reshape(h, w, 3)


def _ppm_decode(payload: bytes, width: int, height: int,
                channels: int) -> np.ndarray:
    arr = decode_ppm(bytes(payload))
    assert arr.shape == (height, width, channels), \
        (arr.shape, height, width, channels)
    return arr


_DECODERS = {"fake": _fake_decode, "ppm": _ppm_decode}


def synthetic_ppm_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL binary PPM images (pixel
    bytes = the md5-seeded pattern of the doc text, P6-encoded) — the
    real-codec twin of `synthetic_media`, so
    decode_and_featurize(..., codec='ppm') exercises an actual decode
    while keeping the same integer-exact feature oracle."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                did = int(t.doc_id)
                w, h = did % 64 + 16, did % 48 + 16
                arr = _fake_decode(t.text.encode("utf-8"), w, h, 3)
                rows.append((did, "image", encode_ppm(arr),
                             {"width": w, "height": h, "channels": 3,
                              "sample_rate": 16000,
                              "n_frames": did % 7 + 1}))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "payload", "meta"])

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def decode_and_featurize(media: DataFrame, fake: bool = True,
                         codec: str = "fake") -> DataFrame:
    """media -> per-item features: per-channel mean (mean_c0), overall
    mean (mean_all) and a 60-bit aHash signature from the 8x8 block
    thumbnail. One Arrow batch per partition; no per-row Python
    outside the (stubbed) codec call.

    The feature math is integer-exact by construction so the DuckDB
    oracle matches bitwise with no rounding: every statistic reduces
    to sums of uint8 values (order-free exact in float64/int64), a
    single final IEEE division, and the aHash threshold compares
    64*block_sum > total_sum in pure integers (equivalent to
    block_mean > mean(block_means) since every 8x8 block of the
    cropped thumbnail has the same pixel count).

    ``codec='ppm'`` selects the REAL pure-NumPy P6 decoder (payloads
    must be binary PPM, see `synthetic_ppm_media`); ``codec='fake'``
    with ``fake=False`` raises — PNG/JPEG/audio codecs are genuinely
    absent in this container."""
    if codec == "fake" and not fake:
        raise NotImplementedError(
            "real PNG/JPEG/audio codecs are not available in this "
            "container; use codec='ppm' for the real decode path or "
            "install PIL/ffmpeg and replace _fake_decode")
    decode = _DECODERS[codec]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                m = t.meta
                w, h = int(m["width"]), int(m["height"])
                arr = decode(bytes(t.payload), w, h,
                             int(m["channels"]))
                ch_sums = arr.reshape(-1, arr.shape[2]) \
                    .astype(np.int64).sum(axis=0)
                n_pix = w * h
                means = ch_sums / float(n_pix)
                mean_all = ((means[0] + means[1]) + means[2]) / 3.0
                # 60-bit aHash from the 8x8 block sums of the
                # channel-sum "gray" plane (integer threshold)
                gray = arr.astype(np.int64).sum(axis=2)
                h8, w8 = gray.shape[0] // 8, gray.shape[1] // 8
                th = gray[: h8 * 8, : w8 * 8]
                S = th.reshape(8, h8, 8, w8).sum(axis=(1, 3))
                bits = (64 * S > S.sum()).ravel()[:60]
                sig = int(sum(int(b) << i for i, b in enumerate(bits)))
                rows.append((t.doc_id, t.kind, float(means[0]),
                             float(mean_all), sig))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "kind", "mean_c0", "mean_all", "phash"])

    return media.mapInPandas(
        run, schema=("doc_id long, kind string, mean_c0 double, "
                     "mean_all double, phash long"))


def featurize_oracle_sql(docs_tbl: str = "documents",
                         kind_expr: str | None = None) -> str:
    """DuckDB replica of synthetic_media + _fake_decode +
    decode_and_featurize: flattened byte index i of the (H, W, C=3)
    fake image has value md5(text)[i % 16] (the md5-seeded repeating
    byte pattern), channel = i % 3, pixel = i // 3. All aggregates are
    integer sums; divisions mirror the kernel's exact order.
    ``kind_expr="'image'"`` matches the real-PPM media table (whose
    pixel plane is the same md5 pattern, P6-encoded — so this oracle
    checks the REAL decoder bit-for-bit too)."""
    # max W*H*C: (63+16)*(47+16)*3 < 80*64*3
    cap = 80 * 64 * 3
    byte = ("('0x' || substring(hx, CAST(2 * (i % 16) AS INT) + 1, 2))"
            "::INT")
    kind = kind_expr or ("CASE WHEN doc_id % 3 = 0 THEN 'image' "
                         "WHEN doc_id % 3 = 1 THEN 'audio' "
                         "ELSE 'video' END")
    return f"""
    WITH m AS (
      SELECT doc_id,
             {kind} AS kind,
             md5(text) AS hx,
             CAST(doc_id % 64 + 16 AS BIGINT) AS w,
             CAST(doc_id % 48 + 16 AS BIGINT) AS h
      FROM {docs_tbl}),
    pos AS (
      SELECT m.*, t.i, {byte} AS val,
             CAST(i % 3 AS INT) AS chan,
             (i // 3) // w AS pr, (i // 3) % w AS pc
      FROM m CROSS JOIN range(0, {cap}) t(i)
      WHERE t.i < m.w * m.h * 3),
    chans AS (
      SELECT doc_id, kind, w, h, chan, sum(val) AS s
      FROM pos GROUP BY doc_id, kind, w, h, chan),
    chan_means AS (
      SELECT doc_id, kind,
             max(CASE WHEN chan = 0 THEN s END) / CAST(w * h AS DOUBLE)
               AS m0,
             max(CASE WHEN chan = 1 THEN s END) / CAST(w * h AS DOUBLE)
               AS m1,
             max(CASE WHEN chan = 2 THEN s END) / CAST(w * h AS DOUBLE)
               AS m2
      FROM chans GROUP BY doc_id, kind, w, h),
    gray AS (
      SELECT doc_id, w, h, pr, pc, sum(val) AS g
      FROM pos GROUP BY doc_id, w, h, pr, pc),
    blocks AS (
      SELECT doc_id, (pr // (h // 8)) AS br, (pc // (w // 8)) AS bc,
             sum(g) AS sb
      FROM gray
      WHERE pr < (h // 8) * 8 AND pc < (w // 8) * 8
      GROUP BY doc_id, (pr // (h // 8)), (pc // (w // 8))),
    sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN 64 * sb > tot AND br * 8 + bc < 60
                           THEN (CAST(1 AS BIGINT)
                                 << CAST(br * 8 + bc AS INT))
                           ELSE 0 END) AS BIGINT) AS phash
      FROM (SELECT doc_id, br, bc, sb,
                   SUM(sb) OVER (PARTITION BY doc_id) AS tot
            FROM blocks) b
      GROUP BY doc_id)
    SELECT c.doc_id, c.kind, c.m0 AS mean_c0,
           ((c.m0 + c.m1) + c.m2) / 3.0 AS mean_all, s.phash
    FROM chan_means c JOIN sig s ON s.doc_id = c.doc_id
    """


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


# --- real codec #2: WAV (RIFF/PCM16), pure NumPy --------------------------
# The audio twin of the PPM path: canonical 44-byte RIFF header + PCM16
# little-endian frames is a public spec decodable with frombuffer, so a
# second modality gets a REAL decode end to end. MP3/AAC/FLAC remain
# honest stubs (no ffmpeg in the container).

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 -> RIFF/WAVE PCM16 bytes (canonical
    44-byte header, little-endian throughout)."""
    import struct
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate,
                                    byte_rate, ch * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> ((n, ch) int16, sample_rate). Walks the
    chunk list (fmt /data may be preceded by LIST etc. per the RIFF
    spec); rejects non-PCM16 encodings."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n_ch, rate, bits = 12, None, None, None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        sz = struct.unpack("<I", payload[i + 4:i + 8])[0]
        body = payload[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, n_ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM16 WAV is supported (no ffmpeg in "
                    "this container)")
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if data is None or n_ch is None:
        raise ValueError("missing fmt /data chunk")
    arr = np.frombuffer(data, dtype="<i2")
    return arr.reshape(-1, n_ch), rate


def synthetic_wav_media(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Media table whose payloads are REAL mono PCM16 WAV files:
    sample[i] = (md5pattern(text)[i] - 128) * 256 over n = doc_id %
    2048 + 256 samples — the same md5-seeded byte pattern as the image
    paths, so the DuckDB oracle recomputes every sample exactly."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                did = int(t.doc_id)
                n = did % 2048 + 256
                seed = hashlib.md5(t.text.encode("utf-8")).digest()
                base = np.frombuffer(seed * (n // 16 + 1),
                                     dtype=np.uint8)[:n]
                samples = (base.astype(np.int16) - 128) * 256
                rows.append((did, "audio",
                             encode_wav(samples, 16000),
                             {"width": 0, "height": 0, "channels": 1,
                              "sample_rate": 16000, "n_frames": 1}))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "payload", "meta"])

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema=MEDIA_SCHEMA)


def audio_featurize(media: DataFrame) -> DataFrame:
    """WAV media -> per-item integer-exact features: sample count,
    mean amplitude (one IEEE division of an int sum), peak |amp|, and
    zero-crossing count (adjacent sign-bit flips, sign(x) := x >= 0).
    All reduce to int64 sums/extrema of int16 samples — order-free
    exact, so the DuckDB oracle matches bitwise."""
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                arr, rate = decode_wav(bytes(t.payload))
                s = arr[:, 0].astype(np.int64)
                nonneg = s >= 0
                rows.append((
                    t.doc_id, int(s.shape[0]), rate,
                    float(s.sum()) / s.shape[0],
                    int(np.abs(s).max()),
                    int((nonneg[1:] != nonneg[:-1]).sum())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_samples", "sample_rate", "mean_amp",
                "peak_amp", "zero_crossings"])

    return media.mapInPandas(
        run, schema=("doc_id long, n_samples long, sample_rate int, "
                     "mean_amp double, peak_amp long, "
                     "zero_crossings long"))


def audio_featurize_oracle_sql(docs_tbl: str = "documents") -> str:
    """DuckDB replica of synthetic_wav_media + decode_wav +
    audio_featurize: sample i of doc d is (md5(text)[i % 16] - 128)
    * 256 over n = doc_id % 2048 + 256 samples; all aggregates are
    integer; mean_amp mirrors the kernel's single division."""
    byte = ("('0x' || substring(hx, CAST(2 * (i % 16) AS INT) + 1, 2))"
            "::INT")
    return f"""
    WITH m AS (
      SELECT doc_id, md5(text) AS hx,
             CAST(doc_id % 2048 + 256 AS BIGINT) AS n
      FROM {docs_tbl}),
    s AS (
      SELECT m.doc_id, m.n, t.i,
             CAST(({byte} - 128) * 256 AS BIGINT) AS amp
      FROM m CROSS JOIN range(0, 2304) t(i)
      WHERE t.i < m.n),
    x AS (
      SELECT doc_id, n, i, amp,
             lag(amp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      FROM s)
    SELECT doc_id, max(n) AS n_samples,
           CAST(16000 AS INT) AS sample_rate,
           CAST(sum(amp) AS DOUBLE) / max(n) AS mean_amp,
           max(abs(amp)) AS peak_amp,
           CAST(sum(CASE WHEN prev IS NOT NULL
                          AND ((amp >= 0) <> (prev >= 0))
                    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM x GROUP BY doc_id
    """
