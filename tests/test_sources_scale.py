"""Scale paths of the file sources/sinks: block-parallel GeoTIFF scan
(>1 task per file) and the guarded / distributed writers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_spatial_spark.grid import NODATA, RasterMeta, synthetic_dem
from go_spatial_spark.sources import raster_io as io

FIX = "/root/reference/geospatialfiles/tests/testdata"
GOLDEN = 429.42730712890625  # rasterFormat_test.go:30


def test_geotiff_distributed_matches_driver_read(spark):
    meta, df = io.read_geotiff_distributed(spark, f"{FIX}/DEM.tif",
                                           blocks_per_task=16)
    assert (meta.rows, meta.cols) == (188, 237)
    got = df.where("row = 100 AND col = 100").collect()
    assert len(got) == 1 and got[0]["value"] == GOLDEN
    # multi-task: 188 one-row strips / 16 per task -> 12 block groups
    _, tags = io._parse_tiff_ifd_seek(f"{FIX}/DEM.tif")
    blocks = io._tiff_blocks(tags)
    assert len(blocks) == 188
    # full equality with the driver-side decode
    _, ref = io.read_geotiff(spark, f"{FIX}/DEM.tif")
    sym = df.exceptAll(ref).unionAll(ref.exceptAll(df))
    assert sym.count() == 0


def _write_deflate_tiff(path, arr, rows_per_strip=4):
    """Minimal multi-strip deflate-compressed float64 TIFF builder."""
    import struct
    import zlib
    h, w = arr.shape
    strips = []
    for y in range(0, h, rows_per_strip):
        strips.append(zlib.compress(
            arr[y:y + rows_per_strip].astype("<f8").tobytes()))
    n_tags = 10
    data_off = 8 + 2 + n_tags * 12 + 4
    overflow = bytearray()

    def alloc(b):
        off = data_off + len(overflow)
        overflow.extend(b)
        return off

    n_strips = len(strips)
    cnts = [len(s) for s in strips]
    cnts_off = alloc(struct.pack("<" + "I" * n_strips, *cnts))
    offs_pos = alloc(b"\x00" * 4 * n_strips)
    offs = []
    for s in strips:
        offs.append(alloc(s))
    overflow[offs_pos - data_off:offs_pos - data_off + 4 * n_strips] = \
        struct.pack("<" + "I" * n_strips, *offs)

    def short(v):
        return struct.pack("<HH", v, 0)

    def long_(v):
        return struct.pack("<I", v)

    entries = [
        (256, 3, 1, short(w)), (257, 3, 1, short(h)),
        (258, 3, 1, short(64)), (259, 3, 1, short(8)),
        (262, 3, 1, short(1)),
        (273, 4, n_strips, long_(offs[0]) if n_strips == 1
         else long_(offs_pos)),
        (277, 3, 1, short(1)), (278, 3, 1, short(rows_per_strip)),
        (279, 4, n_strips, long_(cnts[0]) if n_strips == 1
         else long_(cnts_off)),
        (339, 3, 1, short(3)),
    ]
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8))
        f.write(struct.pack("<H", n_tags))
        for tag, typ, cnt, val in entries:
            f.write(struct.pack("<HHI", tag, typ, cnt)
                    + val.ljust(4, b"\x00")[:4])
        f.write(struct.pack("<I", 0))
        f.write(bytes(overflow))


def test_geotiff_distributed_compressed(spark, tmp_path):
    """Compressed (deflate) blocks decode per task too."""
    rng = np.arange(22 * 13, dtype=np.float64).reshape(22, 13) / 8.0
    p = str(tmp_path / "z.tif")
    _write_deflate_tiff(p, rng, rows_per_strip=4)
    meta, df = io.read_geotiff_distributed(spark, p, blocks_per_task=2)
    pdf = df.toPandas()
    got = np.full((22, 13), np.nan)
    got[pdf["row"], pdf["col"]] = pdf["value"]
    assert np.array_equal(got, rng)


def test_driver_writer_ceiling(spark):
    big = RasterMeta(rows=100_000, cols=100_000)
    df = spark.range(1).select(
        F.lit(0).alias("row"), F.lit(0).alias("col"),
        F.lit(1.0).alias("value"))
    with pytest.raises(ValueError, match="driver-assembly ceiling"):
        io._assemble_driver(df, big)
    with pytest.raises(ValueError, match="driver-assembly ceiling"):
        io.write_whitebox(df, big, "/tmp/never.dep")


def test_distributed_geotiff_writer_byte_identical(spark, tmp_path):
    meta = RasterMeta(rows=40, cols=30)
    dem = synthetic_dem(spark, 40, 30)
    p1 = str(tmp_path / "driver.tif")
    p2 = str(tmp_path / "dist.tif")
    io.write_geotiff(dem, meta, p1)
    io.write_geotiff_distributed(dem, meta, p2)
    with open(p1, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
    # and it round-trips through the distributed reader
    meta2, back = io.read_geotiff_distributed(spark, p2, blocks_per_task=7)
    assert back.count() == dem.count()
    sym = back.exceptAll(dem).unionAll(dem.exceptAll(back))
    assert sym.count() == 0


def test_distributed_writer_rows_spanning_batches(spark, tmp_path):
    """A grid row whose cells span several Arrow batches must still
    produce ONE complete strip (regression: unsorted batches caused
    partial-strip clobbering)."""
    from pyspark.sql import functions as F
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        R, C = 4, 350  # each row is 3.5 batches
        meta = RasterMeta(rows=R, cols=C)
        dem = spark.range(R * C).select(
            (F.col("id") / C).cast("int").alias("row"),
            (F.col("id") % C).cast("int").alias("col"),
            (F.col("id") % 977).cast("double").alias("value"))
        p1 = str(tmp_path / "a.tif")
        p2 = str(tmp_path / "b.tif")
        io.write_geotiff(dem, meta, p1)
        io.write_geotiff_distributed(dem, meta, p2)
        with open(p1, "rb") as f1, open(p2, "rb") as f2:
            assert f1.read() == f2.read()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
