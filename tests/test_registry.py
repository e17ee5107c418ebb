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
