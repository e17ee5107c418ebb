"""Generate the committed format-reader fixtures in tests/fixtures/fmtq.

Every file encodes the SAME deterministic 64x64 synthetic DEM (the
integer-congruence formula of grid.synthetic_dem — all values dyadic
rationals k/64 with |v| < 600, exactly representable in float32 and in
finite decimal), or the formula-derived LAS point cloud. The files are
written HERE with plain NumPy/struct straight from the public format
specs (ArcGIS ASCII/float grid, GRASS ASCII, LAS 1.2) — deliberately
NOT with go_spatial_spark's writers — so the driver CORRECTNESS rows
(`read_arcgis_ascii` etc. vs the DuckDB `synthetic_dem_sql` oracle)
check the READERS against an independent encoding of the formula, not
a round-trip of our own code.

Run once; outputs are committed. Deterministic: byte-identical on
re-run.
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_spatial_spark.grid import synthetic_dem_numpy  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "fmtq")
R = C = 64
NODATA = -32768.0

# LAS fixture parameters — all scales/values exact dyadic rationals so
# int*scale+offset arithmetic is bit-identical between the reader
# (float64) and the DuckDB oracle SQL.
LAS_N = 199
LAS_SCALES = (0.25, 0.5, 0.015625)
LAS_OFFSETS = (100.0, -50.0, 12.5)


def las_fields(i: np.ndarray):
    """Integer point fields for point i (mirrored in the oracle SQL)."""
    xi = (i * 3) % 257
    yi = (i * 7) % 263
    zi = (i * i) % 1024
    inten = (i * 11) % 613
    cls = i % 13
    ret = (i % 5) + 1
    gps = 100000.0 + i * 0.5
    return xi, yi, zi, inten, cls, ret, gps


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    arr = synthetic_dem_numpy(R, C, nodata=NODATA)

    # --- ArcGIS ASCII grid (public ESRI ASCII raster spec) ---------------
    with open(os.path.join(OUT, "dem64.asc"), "w") as f:
        f.write(f"ncols {C}\nnrows {R}\nxllcorner 0.0\nyllcorner 0.0\n"
                f"cellsize 1.0\nnodata_value {NODATA!r}\n")
        for r in range(R):
            f.write(" ".join(repr(float(v)) for v in arr[r]) + "\n")

    # --- ArcGIS binary float grid (.hdr + .flt, float32 LE) --------------
    with open(os.path.join(OUT, "dem64.hdr"), "w") as f:
        f.write(f"ncols {C}\nnrows {R}\nxllcorner 0.0\nyllcorner 0.0\n"
                f"cellsize 1.0\nnodata_value {NODATA!r}\n"
                f"byteorder LSBFIRST\n")
    arr.astype("<f4").tofile(os.path.join(OUT, "dem64.flt"))

    # --- GRASS ASCII grid ------------------------------------------------
    with open(os.path.join(OUT, "dem64_grass.txt"), "w") as f:
        f.write(f"north: {float(R)!r}\nsouth: 0.0\neast: {float(C)!r}\n"
                f"west: 0.0\nrows: {R}\ncols: {C}\n")
        for r in range(R):
            f.write(" ".join(repr(float(v)) for v in arr[r]) + "\n")

    # --- LAS 1.2, point format 1 (public ASPRS spec) ---------------------
    header = bytearray(227)
    header[0:4] = b"LASF"
    header[24] = 1
    header[25] = 2
    struct.pack_into("<H", header, 90, 42)     # creation yday
    struct.pack_into("<H", header, 92, 2021)   # year
    struct.pack_into("<H", header, 94, 227)    # header size
    struct.pack_into("<I", header, 96, 227)    # offset to points
    header[104] = 1                            # point format 1
    struct.pack_into("<H", header, 105, 28)    # record length
    struct.pack_into("<I", header, 107, LAS_N)
    struct.pack_into("<6d", header, 131, *LAS_SCALES, *LAS_OFFSETS)
    i = np.arange(LAS_N, dtype=np.int64)
    xi, yi, zi, inten, cls, ret, gps = las_fields(i)
    pts = bytearray()
    for j in range(LAS_N):
        rec = bytearray(28)
        struct.pack_into("<3i", rec, 0, int(xi[j]), int(yi[j]), int(zi[j]))
        struct.pack_into("<H", rec, 12, int(inten[j]))
        rec[14] = int(ret[j]) | (5 << 3)       # return j of 5
        rec[15] = int(cls[j])
        struct.pack_into("<d", rec, 20, float(gps[j]))
        pts += rec
    with open(os.path.join(OUT, "pts64.las"), "wb") as f:
        f.write(bytes(header) + bytes(pts))

    print(f"wrote fixtures to {OUT}")


if __name__ == "__main__":
    main()
