"""Console/CLI front end (go-spatial.go:40-485 parity): informational
commands, REPL dispatch, and the file-in/file-out `run` path through
the extension-dispatch reader/writer."""

import numpy as np

from go_spatial_spark.cli import Console, _split_tool_args, main
from go_spatial_spark.grid import (
    NODATA, RasterMeta, synthetic_dem, synthetic_dem_numpy,
)
from go_spatial_spark.sources.raster_io import read_raster, write_raster
from tests.test_kernels import golden_slope


def _console(spark=None):
    lines = []
    con = Console(spark=spark, out=lines.append)
    return con, lines


def test_info_commands():
    con, lines = _console()
    con.listtools()
    text = "\n".join(lines)
    assert "Slope" in text and "BreachDepressions" in text
    lines.clear()
    con.version()
    assert "version 0.1.1" in lines[0]
    lines.clear()
    con.rasterformats()
    assert any("GeoTiff" in ln for ln in lines)
    assert not any("Unknown" in ln for ln in lines)
    lines.clear()
    con.toolhelp("slo")  # truncate-match, pluginManager.go:110-121
    assert "Slope" in lines[0]
    lines.clear()
    con.toolhelp("nosuch")
    assert "Unrecognized tool name" in lines[0]


def test_repl_dispatch():
    con, lines = _console()
    assert con.dispatch("help")
    assert any(ln.startswith("run") for ln in lines)
    lines.clear()
    assert con.dispatch("bench")
    assert lines == ["Benchmark Mode = off"]
    assert con.dispatch("benchon") and con.bench_mode
    assert con.dispatch("nosuchcmd")
    assert any("unrecognized command" in ln for ln in lines)
    assert not con.dispatch("exit")


def test_split_tool_args():
    assert _split_tool_args('"a.dep;b.tif;3"') == ["a.dep", "b.tif", "3"]
    assert _split_tool_args("a.dep, b.tif") == ["a.dep", "b.tif"]
    assert _split_tool_args("") == []


def test_run_slope_file_roundtrip(spark, tmp_path):
    rows, cols = 20, 20
    meta = RasterMeta(rows=rows, cols=cols)
    dem = synthetic_dem(spark, rows, cols)
    in_path = str(tmp_path / "dem.dep")
    write_raster(dem, meta, in_path)

    con, lines = _console(spark)
    con.cwd = str(tmp_path) + "/"
    con.dispatch('run slope "dem.dep;out.tif"')
    assert any("Wrote" in ln for ln in lines)

    m2, out = read_raster(spark, str(tmp_path / "out.tif"))
    pdf = out.toPandas()
    arr = np.full((rows, cols), NODATA)
    arr[pdf["row"], pdf["col"]] = pdf["value"]
    want = golden_slope(synthetic_dem_numpy(rows, cols), 8.0)
    valid = want != NODATA
    assert np.allclose(arr[valid], want[valid], atol=1e-6)


def test_run_default_tif_extension(spark, tmp_path):
    rows, cols = 12, 12
    meta = RasterMeta(rows=rows, cols=cols)
    write_raster(synthetic_dem(spark, rows, cols), meta,
                 str(tmp_path / "dem.dep"))
    con, _ = _console(spark)
    con.cwd = str(tmp_path) + "/"
    con.run("hillshade", ["dem.dep", "shade"])  # no extension
    assert (tmp_path / "shade.tif").exists()  # meanFilter.go:98-101


def test_main_flags(capsys):
    assert main(["-listtools"]) == 0
    out = capsys.readouterr().out
    assert "Slope" in out
    assert main(["-toolargs", "MeanFilter"]) == 0
    out = capsys.readouterr().out
    assert "filter x" in out
