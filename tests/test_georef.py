"""Georeferencing semantics: geographic-CRS detection + zConvFactor
(slope.go:168-175, raster.go:417-436) and pixel-is-area vs
pixel-is-point coordinate mapping (raster.go:383-399)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_spatial_spark.grid import (
    NODATA, RasterMeta, long_to_tiles, run_stencil, synthetic_dem,
    synthetic_dem_numpy, tiles_to_long,
)
from go_spatial_spark import kernels


def test_is_geographic_detection():
    assert RasterMeta(10, 10, epsg=4326).is_geographic
    assert RasterMeta(10, 10, epsg=4277).is_geographic
    assert not RasterMeta(10, 10, epsg=32617).is_geographic
    assert RasterMeta(10, 10, wkt='GEOGCS["WGS 84",...]').is_geographic
    assert not RasterMeta(10, 10, wkt='PROJCS["UTM",...]').is_geographic
    assert RasterMeta(10, 10, xy_units="degrees").is_geographic
    # divergence from the Go stop-gap: no CRS metadata -> projected
    assert not RasterMeta(10, 10).is_geographic


def test_z_conv_factor_formula():
    m = RasterMeta(96, 96, north=50.0, south=40.0, east=10.0, west=0.0,
                   epsg=4326)
    # reference quirk: midLat = (north - south) / 2 (half EXTENT)
    assert m.z_conv_factor == 1.0 / (113200 * np.cos(np.pi / 180.0 * 5.0))
    assert RasterMeta(96, 96).z_conv_factor == 1.0
    # |midLat| > 90 -> factor stays 1 (slope.go:172 guard)
    wide = RasterMeta(96, 96, north=200.0, south=0.0, east=10.0,
                      west=0.0, epsg=4326)
    assert wide.z_conv_factor == 1.0


def _slope_geo_numpy(dem, meta):
    """Straight-line replay of slope.go:196-226 with zConvFactor."""
    zf = meta.z_conv_factor
    egr = 8.0 * meta.mean_cellsize
    rows, cols = dem.shape
    out = np.full_like(dem, NODATA)
    for r in range(rows):
        for c in range(cols):
            z = dem[r, c]
            if z == NODATA:
                continue
            z = z * zf
            N = []
            for dx, dy in zip(kernels.DX, kernels.DY):
                rn, cn = r + dy, c + dx
                zn = dem[rn, cn] if 0 <= rn < rows and 0 <= cn < cols \
                    else NODATA
                N.append(zn * zf if zn != NODATA else z)
            fy = (N[6] - N[4] + 2 * (N[7] - N[3]) + N[0] - N[2]) / egr
            fx = (N[2] - N[4] + 2 * (N[1] - N[5]) + N[0] - N[6]) / egr
            out[r, c] = np.arctan(np.sqrt(fx * fx + fy * fy)) \
                * kernels.RAD_TO_DEG
    return out


def test_slope_geographic_matches_replay(spark):
    R = C = 48
    meta = RasterMeta(rows=R, cols=C, north=50.0, south=40.0, east=10.0,
                      west=0.0, epsg=4326)
    dem = synthetic_dem(spark, R, C)
    tiles = long_to_tiles(dem, meta, tile=16)
    got = run_stencil(tiles, meta, kernels.slope_kernel, halo=1,
                      tile=16, output="long", value_col="slope") \
        .toPandas()
    ref = _slope_geo_numpy(synthetic_dem_numpy(R, C), meta)
    got_g = np.full((R, C), NODATA)
    got_g[got["row"], got["col"]] = got["slope"]
    valid = ref != NODATA
    assert np.array_equal(got_g[valid], ref[valid])
    # and it genuinely differs from the projected-CRS slope
    flat = run_stencil(long_to_tiles(dem, RasterMeta(R, C), tile=16),
                       RasterMeta(R, C), kernels.slope_kernel, halo=1,
                       tile=16, output="long", value_col="slope").toPandas()
    assert not np.allclose(np.sort(got["slope"]), np.sort(flat["slope"]))


def test_pixel_is_point_cellsize_and_roundtrip(spark):
    from go_spatial_spark.operators.spatial_join import (
        raster_to_vector_points, vector_points_to_raster)
    m_area = RasterMeta(10, 10, north=10.0, south=0.0, east=10.0, west=0.0)
    m_point = RasterMeta(10, 10, north=9.0, south=0.0, east=9.0, west=0.0,
                         pixel_is_area=False)
    assert m_area.cellsize_x == 1.0
    assert m_point.cellsize_x == 1.0  # (9-0)/(10-1): raster.go:383-390
    grid = spark.range(100).select(
        (F.col("id") / 10).cast("int").alias("row"),
        (F.col("id") % 10).cast("int").alias("col"),
        F.col("id").cast("double").alias("value"))
    for m in (m_area, m_point):
        pts = raster_to_vector_points(grid, m)
        back = vector_points_to_raster(pts, m, agg="max")
        got = {(r.row, r.col): r.value for r in back.collect()}
        assert got == {(i // 10, i % 10): float(i) for i in range(100)}
    # pixel-is-point node (0,0) sits exactly at (west, north)
    p00 = raster_to_vector_points(grid, m_point) \
        .where(F.col("value") == 0.0).first()
    assert (p00.x, p00.y) == (0.0, 9.0)
