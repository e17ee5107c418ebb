"""Tool registry API surface (mirrors gospatial.py list_tools /
tool_args / run_tool)."""

import numpy as np

from go_spatial_spark import registry
from go_spatial_spark.grid import NODATA, RasterMeta, synthetic_dem, \
    synthetic_dem_numpy
from tests.test_kernels import golden_slope


def test_list_tools():
    names = [n for n, _ in registry.list_tools()]
    assert "Slope" in names and "FillDepressions" in names
    assert names == sorted(names)


def test_tool_args():
    assert "input grid" in registry.tool_args("slope")[0]


def test_run_tool_progress_and_prefix_match(spark):
    rows, cols = 20, 20
    meta = RasterMeta(rows=rows, cols=cols)
    dem = synthetic_dem(spark, rows, cols)
    seen = []
    out = registry.run_tool(spark, "slo", dem, meta,
                            progress=seen.append, tile=8)
    pdf = out.toPandas()
    arr = np.full((rows, cols), NODATA)
    arr[pdf["row"], pdf["col"]] = pdf["slope"]
    want = golden_slope(synthetic_dem_numpy(rows, cols), 8.0)
    assert np.array_equal(arr, want)
    assert seen == [0, 100]


def test_elev_pct_distributed_maps_match_numpy(spark):
    """The distributed 10k-bin prep must be bit-identical to the NumPy
    prep (same f64 expressions, only the histogram crosses the wire)."""
    from go_spatial_spark.operators import window_stats as WS
    rows, cols = 30, 30
    dem = synthetic_dem(spark, rows, cols)
    dem_np = synthetic_dem_numpy(rows, cols)
    want = WS.elevation_percentile_maps(dem_np, NODATA, 10)
    got = WS.elevation_percentile_maps_distributed(dem, NODATA, 10)
    assert got[0] == want[0] and got[1] == want[1]
    assert np.array_equal(got[2], want[2])
    assert np.array_equal(got[3], want[3])
