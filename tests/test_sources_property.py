"""Property-based raster round-trips (hypothesis): arbitrary float64
payloads, ragged dims, arbitrary nodata patterns must survive
write->read bit-exactly through the binary formats (whitebox DOUBLE,
GeoTIFF f64) and the extension-dispatch write_raster/read_raster pair.
Extends the reference's fixed-fixture strategy (rasterFormat_test.go)
with randomized inputs."""

import tempfile
import os

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from go_spatial_spark.grid import NODATA, RasterMeta
from go_spatial_spark.sources import raster_io as io


@st.composite
def grids(draw):
    rows = draw(st.integers(1, 9))
    cols = draw(st.integers(1, 9))
    vals = draw(st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64,
                  min_value=-1e12, max_value=1e12),
        min_size=rows * cols, max_size=rows * cols))
    mask = draw(st.lists(st.booleans(), min_size=rows * cols,
                         max_size=rows * cols))
    arr = np.array(vals, dtype=np.float64).reshape(rows, cols)
    arr[np.array(mask).reshape(rows, cols)] = NODATA
    # the nodata sentinel may not occur as a data value
    arr[np.isclose(arr, NODATA) & ~np.array(mask).reshape(rows, cols)] = 0.0
    return arr


def _to_df(spark, arr):
    rows, cols = arr.shape
    rr, cc = np.nonzero(arr != NODATA)
    data = [(int(r), int(c), float(arr[r, c])) for r, c in zip(rr, cc)]
    df = spark.createDataFrame(data or [(0, 0, NODATA)],
                               "row int, col int, value double")
    if not data:
        df = df.where("value != value")  # empty frame, keep schema
    return df


def _back_to_np(df, rows, cols):
    pdf = df.toPandas()
    arr = np.full((rows, cols), NODATA)
    if len(pdf):
        arr[pdf["row"], pdf["col"]] = pdf["value"]
    return arr


@pytest.mark.parametrize("ext", [".dep", ".tif"])
@given(arr=grids())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_binary_roundtrip_bit_exact(spark, ext, arr):
    rows, cols = arr.shape
    meta = RasterMeta(rows=rows, cols=cols, north=float(rows), south=0.0,
                      east=float(cols), west=0.0)
    df = _to_df(spark, arr)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t" + ext)
        if ext == ".dep":
            io.write_whitebox(df, meta, p, data_type="DOUBLE")
        else:
            io.write_raster(df, meta, p)
        meta2, back = io.read_raster(spark, p)
        assert (meta2.rows, meta2.cols) == (rows, cols)
        got = _back_to_np(back, rows, cols)
    assert np.array_equal(got, arr), (got, arr)


@given(arr=grids())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_write_raster_dispatch_f32_formats(spark, arr):
    """f32 formats (ArcGIS binary / Idrisi real) round-trip within
    float32 precision; nodata pattern preserved exactly."""
    rows, cols = arr.shape
    meta = RasterMeta(rows=rows, cols=cols, north=float(rows), south=0.0,
                      east=float(cols), west=0.0)
    # values must survive f32: quantize the input
    arr = arr.copy()
    valid = arr != NODATA
    arr[valid] = arr[valid].astype(np.float32).astype(np.float64)
    arr[np.isclose(arr, NODATA) & valid] = 0.0
    df = _to_df(spark, arr)
    with tempfile.TemporaryDirectory() as d:
        for ext in (".hdr", ".rdc"):
            p = os.path.join(d, "t" + ext)
            io.write_raster(df, meta, p)
            _, back = io.read_raster(spark, p)
            got = _back_to_np(back, rows, cols)
            assert np.array_equal(got == NODATA, ~valid)
            assert np.allclose(got[valid], arr[valid], rtol=1e-6)
