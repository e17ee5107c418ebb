"""Hydrological operators: FillDepressions (priority-flood) and D8
flow accumulation (pointer + topological accumulation).

Two execution paths, per SURVEY.md §2.5 / §7:

- **exact path** (small rasters / oracle): a faithful replay of the
  reference algorithms, incl. its quirks — run inside one Spark
  partition via applyInPandas so golden fixture parity holds:
  * fillDepressions.go:162-341: edge-seeded priority flood, priority
    key int64(int64(z*10^(8-digits))*100000 + flatindex%100000),
    epsilon-gradient SMALL_NUM = 10^-(8-digits) when fixFlats
    (fillDepressions.go:216-222, 286-322). The seed-push priority uses
    the *last examined* neighbor value zN (a reference quirk at
    fillDepressions.go:262 — zN, not z), reproduced bit-for-bit.
    Ties replay identically because ReferenceHeap mirrors the 1-indexed
    binary heap with strict-> comparisons (breachDepressions.go:972-1016).
  * d8FlowAccumulation.go:182-313: steepest-descent pointer
    (first-max-wins over n=0..7, dist=[diag,cx,diag,cy,...]), FIFO
    topological sweep, init value 1.

- **distributed path** (the 100 TB design): D8 accumulation is
  *order-independent* (integer sums along a forest), so a tile-local
  topological solve + inter-tile inflow fixpoint produces bit-identical
  results to the sequential replay. Each round is one cogrouped
  applyInPandas over (ty,tx); inflows grow monotonically and converge
  in <= (longest flow path / tile size) rounds. Per-round metrics
  (changed inflows, total mass) support checkpoint/resume.
"""

from __future__ import annotations

import math
import sys
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from go_spatial_spark.grid import NODATA, RasterMeta, run_stencil

DX = (1, 1, 1, 0, -1, -1, -1, 0)
DY = (-1, 0, 1, 1, 1, 0, -1, -1)


class ReferenceHeap:
    """1-indexed binary min-heap replicating the reference PQueue's
    swim/sink comparison order (strict >), so pop order matches the Go
    implementation even among equal priorities."""

    def __init__(self):
        self.prio: list[int] = [0]  # index 0 unused
        self.val: list[tuple] = [None]
        self.n = 0

    def push(self, value, priority: int):
        self.prio.append(priority)
        self.val.append(value)
        self.n += 1
        k = self.n
        p, v = self.prio, self.val
        while k > 1 and p[k // 2] > p[k]:
            p[k // 2], p[k] = p[k], p[k // 2]
            v[k // 2], v[k] = v[k], v[k // 2]
            k //= 2

    def pop(self):
        p, v = self.prio, self.val
        out = v[1]
        p[1], v[1] = p[self.n], v[self.n]
        del p[self.n], v[self.n]
        self.n -= 1
        k = 1
        while 2 * k <= self.n:
            j = 2 * k
            if j < self.n and p[j] > p[j + 1]:
                j += 1
            if not p[k] > p[j]:
                break
            p[k], p[j] = p[j], p[k]
            v[k], v[j] = v[j], v[k]
            k = j
        return out

    def __len__(self):
        return self.n


def fill_depressions_np(dem: np.ndarray, fix_flats: bool = True,
                        nodata: float = NODATA) -> np.ndarray:
    """Exact NumPy/heap replay of fillDepressions.go:162-341."""
    rows, cols = dem.shape
    valid = dem != nodata
    mn = dem[valid].min()
    mx = dem[valid].max()
    elev_digits = len(str(int(mx - mn)))
    mult = math.pow(10, float(8 - elev_digits))
    small = 1.0 / mult if fix_flats else 0.0

    out = np.full_like(dem, nodata)
    in_queue = np.zeros((rows + 2, cols + 2), dtype=bool)
    heap = ReferenceHeap()
    num_solved = 0
    num_total = rows * cols

    def val(r, c):
        if 0 <= r < rows and 0 <= c < cols:
            return dem[r, c]
        return nodata

    # seed: edge cells (any NoData/out-of-grid neighbor). Priority uses
    # the *last* zN examined (neighbor 7 = north) — reference quirk.
    for row in range(rows):
        for col in range(cols):
            z = dem[row, col]
            if z != nodata:
                is_edge = False
                zn = z
                for n in range(8):
                    zn = val(row + DY[n], col + DX[n])
                    if zn == nodata:
                        is_edge = True
                if is_edge:
                    p = int(int(zn * mult)) * 100000
                    heap.push((row, col, 0), p)
                    in_queue[row + 1, col + 1] = True
                    out[row, col] = z
                    num_solved += 1
            else:
                num_solved += 1

    while num_solved < num_total:
        row, col, flatindex = heap.pop()
        z = out[row, col]
        for i in range(8):
            rn, cn = row + DY[i], col + DX[i]
            zn = val(rn, cn)
            if zn != nodata and not in_queue[rn + 1, cn + 1]:
                n = 0
                if zn <= z:
                    zn = z + small
                    n = flatindex + 1
                num_solved += 1
                out[rn, cn] = zn
                p = int(int(zn * mult)) * 100000 + (n % 100000)
                heap.push((rn, cn, n), p)
                in_queue[rn + 1, cn + 1] = True
    return out


def fill_depressions(grid: DataFrame, meta: RasterMeta,
                     fix_flats: bool = True) -> DataFrame:
    """Exact single-partition path: the whole raster is one pandas
    group (documented small-raster constraint; the tiled-fixpoint
    variant is the scale path, see module docstring)."""
    rows, cols, nodata = meta.rows, meta.cols, meta.nodata

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        dem = np.full((rows, cols), nodata, dtype=np.float64)
        dem[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = (
            pdf["value"].to_numpy())
        out = fill_depressions_np(dem, fix_flats=fix_flats, nodata=nodata)
        rr, cc = np.nonzero(out != nodata)
        return pd.DataFrame({"row": rr.astype(np.int32),
                             "col": cc.astype(np.int32),
                             "filled": out[rr, cc]})

    return (grid.repartition(1)
            .mapInPandas(lambda it: [solve(pd.concat(list(it)))],
                         schema="row int, col int, filled double"))


# ---------------------------------------------------------------------------
# D8 pointer + flow accumulation
# ---------------------------------------------------------------------------

def d8_pointer_np(dem: np.ndarray, meta: RasterMeta,
                  nodata: float = NODATA) -> np.ndarray:
    """Pointer grid (0 = no downslope, 1..8 = n+1); -1 marks NoData.
    Exact replica of d8FlowAccumulation.go:197-236 (first-max-wins)."""
    cx, cy = meta.cellsize_x, meta.cellsize_y
    diag = math.sqrt(cx * cx + cy * cy)
    dist = (diag, cx, diag, cy, diag, cx, diag, cy)
    rows, cols = dem.shape
    valid = dem != nodata
    zpad = np.full((rows + 2, cols + 2), nodata)
    zpad[1:-1, 1:-1] = dem
    max_slope = np.full(dem.shape, -np.inf)
    direction = np.zeros(dem.shape, dtype=np.int8)
    for n in range(8):
        zn = zpad[1 + DY[n]:1 + DY[n] + rows, 1 + DX[n]:1 + DX[n] + cols]
        nv = zn != nodata
        with np.errstate(invalid="ignore"):
            slope = (dem - zn) / dist[n]
        better = nv & (slope > max_slope)
        max_slope = np.where(better, slope, max_slope)
        direction = np.where(better, n + 1, direction)
    direction = np.where(max_slope > 0, direction, 0)
    out = np.where(valid, direction.astype(np.float64), -1.0)
    return out


def d8_pointer_kernel(padded: np.ndarray, halo: int, ctx) -> np.ndarray:
    """Tile kernel: same pointer math with halo-1 neighbor access.
    NoData centers -> meta.nodata so tiles_to_long drops them."""
    nodata = ctx.meta.nodata
    h = padded.shape[0] - 2 * halo
    w = padded.shape[1] - 2 * halo
    c = padded[halo:halo + h, halo:halo + w]
    cx, cy = ctx.meta.cellsize_x, ctx.meta.cellsize_y
    diag = math.sqrt(cx * cx + cy * cy)
    dist = (diag, cx, diag, cy, diag, cx, diag, cy)
    max_slope = np.full(c.shape, -np.inf)
    direction = np.zeros(c.shape, dtype=np.int8)
    for n in range(8):
        zn = padded[halo + DY[n]:halo + DY[n] + h,
                    halo + DX[n]:halo + DX[n] + w]
        nv = zn != nodata
        with np.errstate(invalid="ignore"):
            slope = (c - zn) / dist[n]
        better = nv & (slope > max_slope)
        max_slope = np.where(better, slope, max_slope)
        direction = np.where(better, n + 1, direction)
    direction = np.where(max_slope > 0, direction, 0)
    return np.where(c != nodata, direction.astype(np.float64), nodata)


def d8_accum_np(dem: np.ndarray, meta: RasterMeta,
                nodata: float = NODATA) -> np.ndarray:
    """FIFO topological replay (d8FlowAccumulation.go:240-313).
    Output = accumulation at valid cells, NoData elsewhere."""
    rows, cols = dem.shape
    ptr = d8_pointer_np(dem, meta, nodata)
    valid = ptr >= 0
    indeg = np.zeros(dem.shape, dtype=np.int32)
    for r in range(rows):
        for c in range(cols):
            d = int(ptr[r, c])
            if d > 0:
                indeg[r + DY[d - 1], c + DX[d - 1]] += 1
    acc = np.where(valid, 1.0, nodata)
    from collections import deque
    q = deque((r, c) for r in range(rows) for c in range(cols)
              if valid[r, c] and indeg[r, c] == 0)
    while q:
        r, c = q.popleft()
        d = int(ptr[r, c])
        if d > 0:
            rn, cn = r + DY[d - 1], c + DX[d - 1]
            acc[rn, cn] += acc[r, c]
            indeg[rn, cn] -= 1
            if indeg[rn, cn] == 0:
                q.append((rn, cn))
    return np.where(valid, acc, nodata)


def _tile_solve(dirs: np.ndarray, ext_in: np.ndarray, nodata: float):
    """Topological accumulation inside one tile given external inflows.
    Returns (acc array, list of (d_row_off, d_col_off, lrow, lcol, contrib)
    outflow records in local coords + direction offsets)."""
    h, w = dirs.shape
    valid = dirs >= 0
    acc = np.where(valid, 1.0 + ext_in, 0.0)
    indeg = np.zeros((h, w), dtype=np.int32)
    # internal receivers
    d = dirs.astype(np.int32)
    for n in range(8):
        src = valid & (d == n + 1)
        rr, cc = np.nonzero(src)
        tr, tc = rr + DY[n], cc + DX[n]
        inside = (tr >= 0) & (tr < h) & (tc >= 0) & (tc < w)
        np.add.at(indeg, (tr[inside], tc[inside]), 1)
    # topological sweep (python loop over tile cells)
    stack = list(zip(*np.nonzero(valid & (indeg == 0))))
    outflows = []
    while stack:
        r, c = stack.pop()
        k = d[r, c]
        if k > 0:
            rn, cn = r + DY[k - 1], c + DX[k - 1]
            if 0 <= rn < h and 0 <= cn < w:
                acc[rn, cn] += acc[r, c]
                indeg[rn, cn] -= 1
                if indeg[rn, cn] == 0:
                    stack.append((rn, cn))
            else:
                outflows.append((rn, cn, acc[r, c]))
    return acc, outflows


def d8_flow_accum(dem_tiles: DataFrame, meta: RasterMeta, tile: int = 256,
                  max_rounds: int = 64) -> DataFrame:
    """Distributed D8 accumulation: tile-local topo solve + inter-tile
    inflow fixpoint. Exact (integer sums are order-independent).

    Each round: cogroup(pointer tiles, inflows) -> applyInPandas ->
    outflow records -> groupBy(dest cell).sum -> next inflows.
    Converges when the inflow multiset stops changing (monotone,
    bounded); the inflow table is tiny (boundary cells only).
    """
    spark = dem_tiles.sparkSession
    nodata = meta.nodata
    ptr_tiles = run_stencil(dem_tiles, meta, d8_pointer_kernel,
                            halo=1, tile=tile).cache()
    ptr_tiles.count()

    inflow_schema = "row int, col int, inflow double"
    inflows = spark.createDataFrame([], inflow_schema)

    def make_rounder(emit_acc: bool):
        def fn(key, ptr_pdf: pd.DataFrame, in_pdf: pd.DataFrame):
            ty, tx = int(key[0]), int(key[1])
            if ptr_pdf.empty:
                return pd.DataFrame(
                    columns=["row", "col", "v"]).astype(
                        {"row": "int32", "col": "int32", "v": "float64"})
            t = ptr_pdf.iloc[0]
            h, w = int(t.h), int(t.w)
            dirs = np.frombuffer(t.data, dtype=np.float64).reshape(h, w)
            dirs = np.where(dirs == nodata, -1.0, dirs)
            ext = np.zeros((h, w))
            if not in_pdf.empty:
                lr = in_pdf["row"].to_numpy() - ty * tile
                lc = in_pdf["col"].to_numpy() - tx * tile
                ext[lr, lc] = in_pdf["inflow"].to_numpy()
            acc, outs = _tile_solve(dirs, ext, nodata)
            if emit_acc:
                rr, cc = np.nonzero(dirs >= 0)
                return pd.DataFrame({
                    "row": (rr + ty * tile).astype(np.int32),
                    "col": (cc + tx * tile).astype(np.int32),
                    "v": acc[rr, cc]})
            if not outs:
                return pd.DataFrame(
                    columns=["row", "col", "v"]).astype(
                        {"row": "int32", "col": "int32", "v": "float64"})
            o = np.array(outs)
            return pd.DataFrame({
                "row": (o[:, 0] + ty * tile).astype(np.int32),
                "col": (o[:, 1] + tx * tile).astype(np.int32),
                "v": o[:, 2]})
        return fn

    out_schema = "row int, col int, v double"
    prev_sig = (-1, -1.0)
    for _ in range(max_rounds):
        with_keys = inflows.withColumn(
            "ty", (F.col("row") / tile).cast("int")).withColumn(
            "tx", (F.col("col") / tile).cast("int"))
        outflow = (ptr_tiles.groupBy("ty", "tx")
                   .cogroup(with_keys.groupBy("ty", "tx"))
                   .applyInPandas(make_rounder(False), schema=out_schema))
        # localCheckpoint: truncate per-round lineage (see the W/D
        # fixpoints — plan analysis cost otherwise grows with rounds)
        new_inflows = (outflow.groupBy("row", "col")
                       .agg(F.sum("v").alias("inflow"))).localCheckpoint()
        sig_row = new_inflows.agg(
            F.count("*"), F.coalesce(F.sum("inflow"), F.lit(0.0))).first()
        sig = (sig_row[0], float(sig_row[1]))
        if sig == prev_sig:
            break
        prev_sig = sig
        inflows = new_inflows

    with_keys = inflows.withColumn(
        "ty", (F.col("row") / tile).cast("int")).withColumn(
        "tx", (F.col("col") / tile).cast("int"))
    acc = (ptr_tiles.groupBy("ty", "tx")
           .cogroup(with_keys.groupBy("ty", "tx"))
           .applyInPandas(make_rounder(True), schema=out_schema))
    return acc.select("row", "col", F.col("v").alias("accum"))


# ---------------------------------------------------------------------------
# FD8 flow accumulation — fd8FlowAccum.go:199-813
# ---------------------------------------------------------------------------
# Multiple flow direction: every strictly-lower valid neighbor receives
# faValue * (z-zN)^2 / sum_of_weights (fd8FlowAccum.go:356-383); inflow
# count = number of strictly-higher valid neighbors (:476-495).
# Unlike D8, the float result depends on the order contributions are
# added, so the distributed tile-fixpoint result can differ from the
# sequential replay in the last ulps — goldens compare with rtol=1e-12.

def fd8_accum_np(dem: np.ndarray, nodata: float = NODATA) -> np.ndarray:
    """Sequential FIFO replay of the serial path (fd8FlowAccum.go:464-599)."""
    rows, cols = dem.shape
    valid = dem != nodata

    def val(r, c):
        if 0 <= r < rows and 0 <= c < cols:
            return dem[r, c]
        return nodata

    indeg = np.zeros(dem.shape, dtype=np.int32)
    for r in range(rows):
        for c in range(cols):
            if valid[r, c]:
                j = 0
                for n in range(8):
                    zn = val(r + DY[n], c + DX[n])
                    if zn > dem[r, c] and zn != nodata:
                        j += 1
                indeg[r, c] = j
    out = np.where(valid, 1.0, nodata)
    from collections import deque
    q = deque((r, c) for r in range(rows) for c in range(cols)
              if valid[r, c] and indeg[r, c] == 0)
    while q:
        row, col = q.popleft()
        z = dem[row, col]
        fa = out[row, col]
        weights = np.zeros(8)
        total = 0.0
        down = [False] * 8
        for n in range(8):
            zn = val(row + DY[n], col + DX[n])
            if zn < z and zn != nodata:
                weights[n] = (z - zn) ** 2
                total += weights[n]
                down[n] = True
        for n in range(8):
            if down[n]:
                r2, c2 = row + DY[n], col + DX[n]
                out[r2, c2] += fa * (weights[n] / total)
                indeg[r2, c2] -= 1
                if indeg[r2, c2] == 0:
                    q.append((r2, c2))
    return np.where(valid, out, nodata)


def _fd8_tile_solve(zpad: np.ndarray, ext_in: np.ndarray, nodata: float):
    """FD8 accumulation inside one tile (halo-1 padded DEM) given
    external inflows; returns (acc, outflow records in local coords)."""
    H, W = zpad.shape
    h, w = H - 2, W - 2
    z = zpad[1:-1, 1:-1]
    valid = z != nodata
    # inflow degree counted against *internal* higher neighbors only:
    # cross-tile contributions arrive via ext_in before the sweep.
    indeg = np.zeros((h, w), dtype=np.int32)
    for n in range(8):
        zn = zpad[1 + DY[n]:1 + DY[n] + h, 1 + DX[n]:1 + DX[n] + w]
        rr, cc = np.nonzero(valid & (zn > z) & (zn != nodata))
        # neighbor is the SOURCE; count only if the source is inside
        sr, sc = rr + DY[n], cc + DX[n]
        inside = (sr >= 0) & (sr < h) & (sc >= 0) & (sc < w)
        np.add.at(indeg, (rr[inside], cc[inside]), 1)
    acc = np.where(valid, 1.0 + ext_in, 0.0)
    stack = list(zip(*np.nonzero(valid & (indeg == 0))))
    outflows = []
    while stack:
        r, c = stack.pop()
        zc = z[r, c]
        fa = acc[r, c]
        weights = np.zeros(8)
        total = 0.0
        for n in range(8):
            zn = zpad[1 + r + DY[n], 1 + c + DX[n]]
            if zn < zc and zn != nodata:
                weights[n] = (zc - zn) ** 2
                total += weights[n]
        for n in range(8):
            if weights[n] > 0:
                contrib = fa * (weights[n] / total)
                rn, cn = r + DY[n], c + DX[n]
                if 0 <= rn < h and 0 <= cn < w:
                    acc[rn, cn] += contrib
                    indeg[rn, cn] -= 1
                    if indeg[rn, cn] == 0:
                        stack.append((rn, cn))
                else:
                    outflows.append((rn, cn, contrib))
    return acc, outflows


def fd8_flow_accum(dem_tiles: DataFrame, meta: RasterMeta, tile: int = 256,
                   max_rounds: int = 64) -> DataFrame:
    """Distributed FD8: halo-1 padded DEM tiles + inter-tile inflow
    fixpoint (same shape as d8_flow_accum; contributions are additive)."""
    from go_spatial_spark.grid import padded_tiles
    spark = dem_tiles.sparkSession
    nodata = meta.nodata
    ptiles = padded_tiles(dem_tiles, meta, halo=1, tile=tile).cache()
    ptiles.count()

    def make_rounder(emit_acc: bool):
        def fn(key, tile_pdf: pd.DataFrame, in_pdf: pd.DataFrame):
            ty, tx = int(key[0]), int(key[1])
            empty = pd.DataFrame(
                {"row": pd.Series(dtype="int32"),
                 "col": pd.Series(dtype="int32"),
                 "v": pd.Series(dtype="float64")})
            if tile_pdf.empty:
                return empty
            t = tile_pdf.iloc[0]
            h, w = int(t.h), int(t.w)
            zpad = np.frombuffer(t.data, dtype=np.float64).reshape(h + 2, w + 2)
            ext = np.zeros((h, w))
            if not in_pdf.empty:
                lr = in_pdf["row"].to_numpy() - ty * tile
                lc = in_pdf["col"].to_numpy() - tx * tile
                ext[lr, lc] = in_pdf["inflow"].to_numpy()
            acc, outs = _fd8_tile_solve(zpad, ext, nodata)
            if emit_acc:
                rr, cc = np.nonzero(zpad[1:-1, 1:-1] != nodata)
                return pd.DataFrame({
                    "row": (rr + ty * tile).astype(np.int32),
                    "col": (cc + tx * tile).astype(np.int32),
                    "v": acc[rr, cc]})
            if not outs:
                return empty
            o = np.array(outs)
            return pd.DataFrame({
                "row": (o[:, 0] + ty * tile).astype(np.int32),
                "col": (o[:, 1] + tx * tile).astype(np.int32),
                "v": o[:, 2]})
        return fn

    out_schema = "row int, col int, v double"
    inflows = spark.createDataFrame([], "row int, col int, inflow double")
    prev_sig = (-1, -1.0)
    for _ in range(max_rounds):
        keyed = inflows.withColumn(
            "ty", (F.col("row") / tile).cast("int")).withColumn(
            "tx", (F.col("col") / tile).cast("int"))
        outflow = (ptiles.groupBy("ty", "tx")
                   .cogroup(keyed.groupBy("ty", "tx"))
                   .applyInPandas(make_rounder(False), schema=out_schema))
        new_inflows = (outflow.groupBy("row", "col")
                       .agg(F.sum("v").alias("inflow"))).localCheckpoint()
        srow = new_inflows.agg(
            F.count("*"), F.coalesce(F.sum("inflow"), F.lit(0.0))).first()
        sig = (srow[0], float(srow[1]))
        # FD8 mass converges geometrically with the number of cross-tile
        # hops (flow paths can zig-zag between tiles); stop at float64
        # saturation — within the documented rtol of the sequential replay
        if sig[0] == prev_sig[0] and (
                sig[1] == prev_sig[1]
                or abs(sig[1] - prev_sig[1]) <= 1e-13 * max(abs(sig[1]), 1.0)):
            break
        prev_sig = sig
        inflows = new_inflows

    keyed = inflows.withColumn(
        "ty", (F.col("row") / tile).cast("int")).withColumn(
        "tx", (F.col("col") / tile).cast("int"))
    acc = (ptiles.groupBy("ty", "tx")
           .cogroup(keyed.groupBy("ty", "tx"))
           .applyInPandas(make_rounder(True), schema=out_schema))
    return acc.select("row", "col", F.col("v").alias("accum"))


# ---------------------------------------------------------------------------
# BreachDepressions (full-breach mode) — breachDepressions.go:259-505
# ---------------------------------------------------------------------------

BACKLINK = (5, 6, 7, 8, 1, 2, 3, 4)  # breachDepressions.go:297


def breach_depressions_np(dem: np.ndarray,
                          nodata: float = NODATA,
                          max_depth: float = -1.0,
                          max_length: int = -1,
                          constrained: bool = False,
                          post_breach_fill: bool = False) -> np.ndarray:
    """Exact replay of all three BreachDepressions modes
    (breachDepressions.go:259-814): pit pre-lowering to
    lowestNeighbour - SMALL_NUM (:406-414), edge-seeded priority queue
    with quantization 10^(5-digits) (:328-329), then

    * complete breach (:450-505) when neither constraint is set:
      least-cost carve via backLink trace with an epsilon-decrementing
      channel;
    * selective breach (:506-612) when MaxDepth/MaxLength is set: a
      dry-run trace measures path length and depth (vs the ORIGINAL
      dem, :551) with early exit on either constraint (:562-568); only
      conforming pits are carved, the rest are left for filling;
    * constrained breach (:613-778) additionally lowers the outlet of
      non-conforming pits as far as the constraints allow: the trace
      records the highest original cell (outletHeight/outletDist,
      :666-670), the target cut is outletHeight - maxDepth walked out
      to targetDist = maxLength or outletDist + maxLength/2 (:708-731),
      and the path is lowered to min(current, zTest) until a cell at
      or below the pit elevation is met (:733-757).

    When a constraint left unsolved pits and ``post_breach_fill`` is
    on, the pop order is replayed raising each cell above its
    downslope neighbor (:783-814).  The reference encodes the PADDED
    pop coordinates with the UNPADDED column count
    (``floodorder[i] = row*columns + col`` with row,col in 1..rows/cols,
    :518-520) so decoding sends every last-column cell to the padding
    ring where flowdir=0 — i.e. the last column never gets filled.
    Reproduced verbatim.

    Mode selection mirrors :299-312: a constraint counts as "used"
    only when > 0, and constrained breaching silently downgrades to
    complete breaching when no constraint is used.
    """
    rows, cols = dem.shape
    max_length_or_depth_used = max_depth > 0 or max_length > 0
    if max_length_or_depth_used and max_depth == -1:
        max_depth = sys.float_info.max
    if max_length_or_depth_used and max_length == -1:
        max_length = 2**31 - 1
    perform_constrained = constrained and max_length_or_depth_used
    valid_mask = dem != nodata
    mn = dem[valid_mask].min()
    mx = dem[valid_mask].max()
    elev_digits = len(str(int(mx - mn)))
    mult = math.pow(10, float(5 - elev_digits))
    small = 1.0 / mult * 10.0

    # padded working grids (reference indexes row+1/col+1)
    out = np.full((rows + 2, cols + 2), nodata, dtype=np.float64)
    out[1:-1, 1:-1] = dem
    pits = np.zeros((rows + 2, cols + 2), dtype=bool)
    in_queue = np.zeros((rows + 2, cols + 2), dtype=bool)
    flowdir = np.zeros((rows + 2, cols + 2), dtype=np.int8)

    def dem_val(r, c):
        if 0 <= r < rows and 0 <= c < cols:
            return dem[r, c]
        return nodata

    heap = ReferenceHeap()
    num_pits = 0
    for row in range(rows):
        for col in range(cols):
            z = dem[row, col]
            if z == nodata:
                continue
            is_pit = True
            is_edge = False
            lowest = np.inf
            for n in range(8):
                zn = dem_val(row + DY[n], col + DX[n])
                if zn != nodata and zn < z:
                    is_pit = False
                    break
                elif zn == nodata:
                    is_edge = True
                else:
                    if zn < lowest:
                        lowest = zn
            if is_edge:
                p = int(int(z * mult)) * 100000
                heap.push((row + 1, col + 1, 0), p)
                in_queue[row + 1, col + 1] = True
            if is_pit:
                if not is_edge:
                    pits[row + 1, col + 1] = True
                    num_pits += 1
                if lowest != np.inf:
                    out[row + 1, col + 1] = lowest - small

    def carve(rn, cn, zn):
        # complete-breach channel walk (breachDepressions.go:467-487)
        ztest = zn
        r, c = rn, cn
        while True:
            ztest -= small
            d = flowdir[r, c]
            if d > 0:
                r += DY[d - 1]
                c += DX[d - 1]
                zn2 = out[r, c]
                if zn2 <= ztest or zn2 == nodata:
                    break
                out[r, c] = ztest
            else:
                break

    needs_filling = False
    floodorder: list[int] = []

    if not max_length_or_depth_used:
        # complete breaching (breachDepressions.go:450-505); the loop
        # terminates as soon as the last pit is solved, leaving the
        # rest of the queue unpopped
        num_pits_solved = 0
        while num_pits_solved < num_pits:
            row, col, flatindex = heap.pop()
            for i in range(8):
                rn, cn = row + DY[i], col + DX[i]
                zn = out[rn, cn]
                if zn != nodata and not in_queue[rn, cn]:
                    flowdir[rn, cn] = BACKLINK[i]
                    if pits[rn, cn]:
                        num_pits_solved += 1
                        carve(rn, cn, zn)
                    n = flatindex + 1 if pits[rn, cn] else 0
                    p = int(int(zn * mult)) * 100000 + (n % 100000)
                    heap.push((rn, cn, n), p)
                    in_queue[rn, cn] = True
    elif not perform_constrained:
        # selective breaching (breachDepressions.go:506-612): dry-run
        # trace with constraint early-exit, carve only if conforming
        while len(heap) > 0:
            row, col, flatindex = heap.pop()
            if post_breach_fill:
                floodorder.append(row * cols + col)  # quirk: unpadded cols
            for i in range(8):
                rn, cn = row + DY[i], col + DX[i]
                zn = out[rn, cn]
                if zn != nodata and not in_queue[rn, cn]:
                    flowdir[rn, cn] = BACKLINK[i]
                    if pits[rn, cn]:
                        n_in_path = 0
                        max_path_depth = 0.0
                        ztest = zn
                        r, c = rn, cn
                        while True:
                            ztest -= small
                            d = flowdir[r, c]
                            if d > 0:
                                r += DY[d - 1]
                                c += DX[d - 1]
                                zn2 = out[r, c]
                                if zn2 <= ztest or zn2 == nodata:
                                    n_in_path += 1
                                    break
                                depth = dem[r - 1, c - 1] - ztest
                                if depth > max_path_depth:
                                    max_path_depth = depth
                            else:
                                n_in_path += 1
                                break
                            n_in_path += 1
                            if n_in_path > max_length:
                                break
                            if max_path_depth > max_depth:
                                break
                        if (n_in_path <= max_length
                                and max_path_depth <= max_depth):
                            carve(rn, cn, zn)
                        else:
                            needs_filling = True
                    n = flatindex + 1 if pits[rn, cn] else 0
                    p = int(int(zn * mult)) * 100000 + (n % 100000)
                    heap.push((rn, cn, n), p)
                    in_queue[rn, cn] = True
    else:
        # constrained breaching (breachDepressions.go:613-778)
        while len(heap) > 0:
            row, col, flatindex = heap.pop()
            if post_breach_fill:
                floodorder.append(row * cols + col)  # quirk: unpadded cols
            for i in range(8):
                rn, cn = row + DY[i], col + DX[i]
                zn = out[rn, cn]
                if zn != nodata and not in_queue[rn, cn]:
                    flowdir[rn, cn] = BACKLINK[i]
                    if pits[rn, cn]:
                        # full trace, no early exit; record the highest
                        # ORIGINAL cell along the path (:644-676)
                        n_in_path = 0
                        max_path_depth = 0.0
                        outlet_height = -sys.float_info.max
                        outlet_dist = 0
                        ztest = zn
                        r, c = rn, cn
                        while True:
                            ztest -= small
                            d = flowdir[r, c]
                            if d > 0:
                                r += DY[d - 1]
                                c += DX[d - 1]
                                zn2 = out[r, c]
                                if zn2 <= ztest or zn2 == nodata:
                                    n_in_path += 1
                                    break
                                z_orig = dem[r - 1, c - 1]
                                depth = z_orig - ztest
                                if depth > max_path_depth:
                                    max_path_depth = depth
                                if z_orig > outlet_height:
                                    outlet_height = z_orig
                                    outlet_dist = n_in_path
                            else:
                                n_in_path += 1
                                break
                            n_in_path += 1
                        if (n_in_path <= max_length
                                and max_path_depth <= max_depth):
                            carve(rn, cn, zn)
                        else:
                            # lower the outlet as far as allowed
                            # (:702-757)
                            needs_filling = True
                            ztest = outlet_height - max_depth
                            target_dist = n_in_path
                            if n_in_path > max_length:
                                if outlet_dist < max_length // 2:
                                    target_dist = max_length
                                else:
                                    target_dist = (outlet_dist
                                                   + max_length // 2)
                                r, c = rn, cn
                                for _ in range(target_dist):
                                    d = flowdir[r, c]
                                    if d > 0:
                                        r += DY[d - 1]
                                        c += DX[d - 1]
                                        ztest = out[r, c]
                                    else:
                                        break
                                if outlet_height - ztest > max_depth:
                                    ztest = outlet_height - max_depth
                            r, c = rn, cn
                            n_in_path = 0
                            while True:
                                d = flowdir[r, c]
                                if d > 0:
                                    r += DY[d - 1]
                                    c += DX[d - 1]
                                    zn2 = out[r, c]
                                    if zn2 <= zn or zn2 == nodata:
                                        break
                                    if out[r, c] > ztest:
                                        out[r, c] = ztest
                                else:
                                    break
                                n_in_path += 1
                                if n_in_path > target_dist:
                                    break
                    n = flatindex + 1 if pits[rn, cn] else 0
                    p = int(int(zn * mult)) * 100000 + (n % 100000)
                    heap.push((rn, cn, n), p)
                    in_queue[rn, cn] = True

    if needs_filling and post_breach_fill:
        # post-breach fill replay (:783-814) with the verbatim
        # encode/decode mismatch: padded coords, unpadded column count
        for fo in floodorder:
            row, col = fo // cols, fo % cols
            z = out[row, col]
            d = flowdir[row, col]
            if d > 0:
                rn, cn = row + DY[d - 1], col + DX[d - 1]
                zn = out[rn, cn]
                if zn != nodata and z <= zn + small:
                    out[row, col] = zn + small

    result = out[1:-1, 1:-1].copy()
    result[~valid_mask] = nodata
    return result


def breach_depressions(grid: DataFrame, meta: RasterMeta,
                       max_depth: float = -1.0,
                       max_length: int = -1,
                       constrained: bool = False,
                       post_breach_fill: bool = False) -> DataFrame:
    """Exact single-partition path (same pattern as fill_depressions)."""
    rows, cols, nodata = meta.rows, meta.cols, meta.nodata

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        dem = np.full((rows, cols), nodata, dtype=np.float64)
        dem[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = (
            pdf["value"].to_numpy())
        out = breach_depressions_np(
            dem, nodata=nodata, max_depth=max_depth, max_length=max_length,
            constrained=constrained, post_breach_fill=post_breach_fill)
        rr, cc = np.nonzero(out != nodata)
        return pd.DataFrame({"row": rr.astype(np.int32),
                             "col": cc.astype(np.int32),
                             "breached": out[rr, cc]})

    return (grid.repartition(1)
            .mapInPandas(lambda it: [solve(pd.concat(list(it)))],
                         schema="row int, col int, breached double"))


def count_interior_pits(dem: np.ndarray, nodata: float = NODATA) -> int:
    """Diagnostic: interior cells with no strictly-lower valid neighbor
    and no NoData/edge contact (the breach target set)."""
    rows, cols = dem.shape
    n_pits = 0
    for row in range(rows):
        for col in range(cols):
            z = dem[row, col]
            if z == nodata:
                continue
            is_pit, is_edge = True, False
            for n in range(8):
                r2, c2 = row + DY[n], col + DX[n]
                if 0 <= r2 < rows and 0 <= c2 < cols:
                    zn = dem[r2, c2]
                    if zn == nodata:
                        is_edge = True
                    elif zn < z:
                        is_pit = False
                        break
                else:
                    is_edge = True
            if is_pit and not is_edge:
                n_pits += 1
    return n_pits


# ---------------------------------------------------------------------------
# BreachStreams — breachStreams.go:166-508
# ---------------------------------------------------------------------------

def breach_streams_np(dem: np.ndarray, streams: np.ndarray,
                      nodata: float = NODATA,
                      streams_nodata: float = NODATA) -> np.ndarray:
    """Exact replay of BreachStreams: carve a stream network into a
    DEM. Stream cells get ~10^13-lower queue priorities so they are
    always processed first (breachStreams.go:307-319); pit definition
    is conditioned on stream membership (:283-305); mult=10^(8-digits),
    flat-index modulo 10000 (:313, :442-447).

    Faithfully reproduces two reference quirks: (a) lowestNeighbour is
    the lowest neighbor with zN >= z (lower neighbors are excluded —
    no break in the scan loop, :283-305); (b) inside the carve walk the
    stream-raster lookups use *padded* coordinates
    (streams.Value(r, c) at :394/:401 with r,c already +1), i.e. they
    read the stream flag one cell down-right of the path cell."""
    rows, cols = dem.shape
    valid_mask = dem != nodata
    mn = dem[valid_mask].min()
    mx = dem[valid_mask].max()
    elev_digits = len(str(int(mx - mn)))
    mult = math.pow(10, float(8 - elev_digits))
    small = 1.0 / mult * 10.0

    if streams.shape != dem.shape:
        raise ValueError("input rasters must be of the same dimensions")

    def dem_val(r, c):
        if 0 <= r < rows and 0 <= c < cols:
            return dem[r, c]
        return nodata

    def stream_val(r, c):
        if 0 <= r < rows and 0 <= c < cols:
            return streams[r, c]
        return streams_nodata

    def is_stream_at(r, c):
        s = stream_val(r, c)
        return s != streams_nodata and s > 0

    out = np.full((rows + 2, cols + 2), nodata, dtype=np.float64)
    out[1:-1, 1:-1] = dem
    pits = np.zeros((rows + 2, cols + 2), dtype=bool)
    in_queue = np.zeros((rows + 2, cols + 2), dtype=bool)
    flowdir = np.zeros((rows + 2, cols + 2), dtype=np.int8)
    heap = ReferenceHeap()
    num_pits = 0

    for row in range(rows):
        for col in range(cols):
            z = dem[row, col]
            if z == nodata:
                continue
            is_pit, is_edge = True, False
            lowest = np.inf
            is_stream = is_stream_at(row, col)
            for n in range(8):
                zn = dem_val(row + DY[n], col + DX[n])
                sn = stream_val(row + DY[n], col + DX[n])
                if zn != nodata and zn < z:
                    if not is_stream:
                        is_pit = False
                    elif sn != streams_nodata and sn > 0:
                        is_pit = False
                elif zn == nodata:
                    is_edge = True
                else:
                    if zn < lowest:
                        lowest = zn
            if is_edge:
                if is_stream:
                    p = int(int(z * mult)) * 10000
                else:
                    p = 10000000000000 + int(int(z * mult)) * 10000
                heap.push((row + 1, col + 1, 0), p)
                in_queue[row + 1, col + 1] = True
            if is_pit:
                if not is_edge:
                    pits[row + 1, col + 1] = True
                    num_pits += 1
                if lowest != np.inf and not is_stream:
                    out[row + 1, col + 1] = lowest - small

    num_pits_solved = 0
    while num_pits_solved < num_pits and len(heap):
        row, col, flatindex = heap.pop()
        for i in range(8):
            rn, cn = row + DY[i], col + DX[i]
            zn = out[rn, cn]
            if zn != nodata and not in_queue[rn, cn]:
                flowdir[rn, cn] = BACKLINK[i]
                if pits[rn, cn]:
                    num_pits_solved += 1
                    ztest = zn
                    r, c = rn, cn
                    while True:
                        ztest -= small
                        # reference quirk: padded-coordinate lookup
                        if is_stream_at(r, c):
                            lowest = np.inf
                            for n in range(8):
                                sn = stream_val(r + DY[n], c + DX[n])
                                zn3 = out[r + DY[n], c + DX[n]] \
                                    if (0 <= r + DY[n] < rows + 2
                                        and 0 <= c + DX[n] < cols + 2) \
                                    else nodata
                                if (sn == 0 or sn == streams_nodata) \
                                        and zn3 != nodata:
                                    if zn3 < lowest:
                                        lowest = zn3
                            if lowest < ztest:
                                ztest = lowest - small
                        d = flowdir[r, c]
                        if d > 0:
                            r += DY[d - 1]
                            c += DX[d - 1]
                            zn2 = out[r, c]
                            if zn2 <= ztest or zn2 == nodata:
                                break
                            out[r, c] = ztest
                        else:
                            break
                n = flatindex + 1 if pits[rn, cn] else 0
                if is_stream_at(rn - 1, cn - 1):
                    p = int(int(zn * mult)) * 10000 + (n % 10000)
                else:
                    p = 10000000000000 + int(int(zn * mult)) * 10000 \
                        + (n % 10000)
                heap.push((rn, cn, n), p)
                in_queue[rn, cn] = True
    result = out[1:-1, 1:-1].copy()
    result[~valid_mask] = nodata
    return result


def synthetic_streams_numpy(rows: int, cols: int,
                            nodata: float = NODATA) -> np.ndarray:
    """Deterministic stream network matching the DEM shape (FIXTURES.md
    §3): a cross of channels plus a diagonal, value 1.0 on stream
    cells, NoData elsewhere."""
    s = np.full((rows, cols), nodata)
    s[rows // 2, :] = 1.0
    s[:, cols // 2] = 1.0
    for i in range(min(rows, cols)):
        s[i, i] = 1.0
    return s


def breach_streams(dem_grid: DataFrame, streams_grid: DataFrame,
                   meta: RasterMeta) -> DataFrame:
    """Two-raster exact path: join DEM and streams long forms on
    (row, col) (breachStreams.go's two-input contract, shape equality
    enforced at :209-212), solve in one partition."""
    rows, cols, nodata = meta.rows, meta.cols, meta.nodata
    joined = dem_grid.join(
        streams_grid.withColumnRenamed("value", "stream"),
        ["row", "col"], "left")

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        dem = np.full((rows, cols), nodata, dtype=np.float64)
        dem[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = (
            pdf["value"].to_numpy())
        streams = np.full((rows, cols), nodata, dtype=np.float64)
        sm = pdf["stream"].notna()
        streams[pdf.loc[sm, "row"].to_numpy(),
                pdf.loc[sm, "col"].to_numpy()] = pdf.loc[sm, "stream"]
        out = breach_streams_np(dem, streams, nodata=nodata)
        rr, cc = np.nonzero(out != nodata)
        return pd.DataFrame({"row": rr.astype(np.int32),
                             "col": cc.astype(np.int32),
                             "breached": out[rr, cc]})

    return (joined.repartition(1)
            .mapInPandas(lambda it: [solve(pd.concat(list(it)))],
                         schema="row int, col int, breached double"))


# ---------------------------------------------------------------------------
# Distributed FillDepressions (tiled priority-flood fixpoint)
# ---------------------------------------------------------------------------
# The scale path for fillDepressions.go. Without the flat-fix epsilon
# (SMALL_NUM=0, i.e. fixFlats=False) the filled surface has a clean
# closed form: W(c) = max(z(c), min over paths c->edge of the max W
# along the path) — the "spill elevation". That fixpoint decomposes
# over tiles: seed each tile's flood from (a) its own edge cells
# (z, where a NoData/out-of-grid neighbor exists) and (b) the current
# W estimates of its halo ring; iterate until no W changes. W is
# monotone non-increasing from +inf and takes values from the finite
# set of input elevations -> finite, exact convergence. The epsilon
# path (fixFlats=True) stays on the single-partition exact replay —
# its increments depend on global heap visit order.

import heapq


def _tile_flood(dem_t: np.ndarray, w_t: np.ndarray,
                halo_pad: np.ndarray, nodata: float) -> np.ndarray:
    """One tile priority-flood. halo_pad is the (h+2, w+2) ring of
    current neighbor-W values (nodata where the neighbor cell is
    NoData, off-grid, or in an absent all-NoData tile; +inf where not
    yet reached). Edge seeds = valid cells with any NoData-ish
    8-neighbor (fillDepressions.go:247-259 semantics, epsilon=0)."""
    h, w = dem_t.shape
    valid = dem_t != nodata
    W = w_t.copy()
    INF = np.float64(1e308)
    pad_vals = halo_pad.copy()
    pad_vals[1:-1, 1:-1] = np.where(valid, dem_t, nodata)
    # edge seeds: any 8-neighbor NoData (internal, cross-tile,
    # off-grid) — vectorized via the 8 shifted views of pad_vals
    edge = np.zeros((h, w), dtype=bool)
    for n in range(8):
        edge |= pad_vals[1 + DY[n]:1 + DY[n] + h,
                         1 + DX[n]:1 + DX[n] + w] == nodata
    edge &= valid
    lower = edge & (dem_t < W)
    W[lower] = dem_t[lower]
    er, ec = np.nonzero(edge)
    heap = [(W[er[i], ec[i]], int(er[i]), int(ec[i]))
            for i in range(len(er))]
    # halo seeds: neighbor-tile W estimates already below +inf
    hr, hc = np.nonzero((halo_pad != nodata) & (halo_pad < INF))
    heap.extend((float(halo_pad[hr[i], hc[i]]),
                 int(hr[i]) - 1, int(hc[i]) - 1)
                for i in range(len(hr)))
    heapq.heapify(heap)
    while heap:
        wv, r, c = heapq.heappop(heap)
        for n in range(8):
            rn, cn = r + DY[n], c + DX[n]
            if 0 <= rn < h and 0 <= cn < w and valid[rn, cn]:
                cand = wv if wv > dem_t[rn, cn] else dem_t[rn, cn]
                if cand < W[rn, cn]:
                    W[rn, cn] = cand
                    heapq.heappush(heap, (cand, rn, cn))
    return W


def fill_depressions_tiled(dem_tiles: DataFrame, meta: RasterMeta,
                           tile: int = 256, max_rounds: int = 64,
                           ckpt_dir: str | None = None) -> DataFrame:
    """Distributed FillDepressions: textbook Priority-Flood semantics
    (filled = max(z, minimax spill elevation over paths to an edge),
    epsilon=0).

    NOTE on reference parity: the Go tool's *seed* priorities use the
    stale zN from the neighbor scan (fillDepressions.go:262 — the
    north neighbor's value, NoData for the whole first row), so its
    output is heap-order-dependent and deviates from minimax near
    edges. The single-partition `fill_depressions` replays that quirk
    bit-for-bit; this distributed path implements the specified
    semantics and is tested against an independent global minimax
    oracle (test_fill_depressions_tiled_exact).

    Per round: W tiles ship halo strips to neighbors (perimeter-sized
    shuffle), each tile refloods locally, a signature check stops at
    the exact fixpoint (W is monotone non-increasing over a finite
    value set)."""
    dem_cached = dem_tiles.cache()
    dem_cached.count()
    ckpt = None
    if ckpt_dir is not None:
        from go_spatial_spark.checkpoint import CheckpointManager
        ckpt = CheckpointManager(ckpt_dir)
    w_tiles = _spill_w_tiles(dem_cached, meta, tile, max_rounds,
                             ckpt=ckpt)
    return _w_to_filled_long(dem_cached, w_tiles, meta, tile)


def _spill_w_tiles(dem_cached: DataFrame, meta: RasterMeta,
                   tile: int, max_rounds: int,
                   ckpt=None, ckpt_prefix: str = "fill_w") -> DataFrame:
    """Tile-form spill surface W (the epsilon=0 priority-flood
    fixpoint); shared by fill_depressions_tiled and
    breach_depressions_tiled. `dem_cached` must already be cached.

    With `ckpt` (a CheckpointManager), every round persists to
    `<prefix>/round=<k>` with per-partition row metrics, and a restart
    resumes from the last completed round (north_rule: resumable at
    tile granularity)."""
    import math as _math
    nodata = meta.nodata
    rows, cols = meta.rows, meta.cols
    n_ty = _math.ceil(rows / tile)
    n_tx = _math.ceil(cols / tile)

    # W state starts at +inf on valid cells (packed with the DEM plane
    # so each round's cogroup only moves W strips + joins static tiles)
    INF = np.float64(1e308)

    def init_w(it):
        for pdf in it:
            for t in pdf.itertuples(index=False):
                dem_t = np.frombuffer(t.data, dtype=np.float64).reshape(
                    t.h, t.w)
                wt = np.where(dem_t != nodata, INF, nodata)
                yield pd.DataFrame({"ty": [t.ty], "tx": [t.tx],
                                    "h": [t.h], "w": [t.w],
                                    "data": [wt.tobytes()]})

    from go_spatial_spark.grid import TILE_SCHEMA, _NEIGHBOR_OFFSETS
    w_tiles = dem_cached.mapInPandas(init_w, schema=TILE_SCHEMA)

    strip_schema = ("ty int, tx int, src_dty int, src_dtx int, "
                    "h int, w int, data binary")

    def emit_strips(it):
        for pdf in it:
            recs = []
            for t in pdf.itertuples(index=False):
                arr = np.frombuffer(t.data, dtype=np.float64).reshape(
                    t.h, t.w)
                for dty, dtx in _NEIGHBOR_OFFSETS:
                    nty, ntx = t.ty + dty, t.tx + dtx
                    if not (0 <= nty < n_ty and 0 <= ntx < n_tx):
                        continue
                    rs = slice(0, min(1, t.h)) if dty < 0 else (
                        slice(max(0, t.h - 1), t.h) if dty > 0
                        else slice(0, t.h))
                    cs = slice(0, min(1, t.w)) if dtx < 0 else (
                        slice(max(0, t.w - 1), t.w) if dtx > 0
                        else slice(0, t.w))
                    strip = np.ascontiguousarray(arr[rs, cs])
                    recs.append((nty, ntx, -dty, -dtx, strip.shape[0],
                                 strip.shape[1], strip.tobytes()))
            if recs:
                yield pd.DataFrame(recs, columns=[
                    "ty", "tx", "src_dty", "src_dtx", "h", "w", "data"])

    def make_flood(emit_long: bool):
        def fn(key, dem_pdf: pd.DataFrame, strips_pdf: pd.DataFrame):
            ty, tx = int(key[0]), int(key[1])
            if dem_pdf.empty:
                if emit_long:
                    return pd.DataFrame({
                        "row": pd.Series(dtype="int32"),
                        "col": pd.Series(dtype="int32"),
                        "filled": pd.Series(dtype="float64")})
                return pd.DataFrame({
                    "ty": pd.Series(dtype="int32"),
                    "tx": pd.Series(dtype="int32"),
                    "h": pd.Series(dtype="int32"),
                    "w": pd.Series(dtype="int32"),
                    "data": pd.Series(dtype=object)})
            dt = dem_pdf.iloc[0]
            h, w = int(dt.h), int(dt.w)
            dem_t = np.frombuffer(dt.dem, dtype=np.float64).reshape(h, w)
            w_t = np.frombuffer(dt.wdata, dtype=np.float64).reshape(h, w)
            # halo ring of neighbor W values; nodata = NoData cell,
            # off-grid, or absent (all-NoData) neighbor tile
            halo_pad = np.full((h + 2, w + 2), nodata, dtype=np.float64)
            for srow in strips_pdf.itertuples(index=False):
                sa = np.frombuffer(srow.data, dtype=np.float64).reshape(
                    srow.h, srow.w)
                dty, dtx = int(srow.src_dty), int(srow.src_dtx)
                rs = slice(0, 1) if dty < 0 else (
                    slice(h + 1, h + 2) if dty > 0 else slice(1, 1 + sa.shape[0]))
                cs = slice(0, 1) if dtx < 0 else (
                    slice(w + 1, w + 2) if dtx > 0 else slice(1, 1 + sa.shape[1]))
                halo_pad[rs, cs] = sa
            W = _tile_flood(dem_t, w_t, halo_pad, nodata)
            if emit_long:
                rr, cc = np.nonzero(dem_t != nodata)
                return pd.DataFrame({
                    "row": (rr + ty * tile).astype(np.int32),
                    "col": (cc + tx * tile).astype(np.int32),
                    "filled": W[rr, cc]})
            return pd.DataFrame({"ty": [ty], "tx": [tx], "h": [h],
                                 "w": [w], "data": [W.tobytes()]})
        return fn

    # signature: exact sum of finite W values + count (monotone
    # non-increasing, values from the finite elevation set)
    def sig_fn(it):
        tot = 0.0
        cnt = 0
        for pdf in it:
            for t in pdf.itertuples(index=False):
                a = np.frombuffer(t.data, dtype=np.float64)
                m = (a != nodata) & (a < INF)
                # exact: values are dyadic rationals (input z's)
                tot += float(a[m].sum())
                cnt += int(m.sum())
        yield pd.DataFrame({"tot": [tot], "cnt": [cnt]})

    def sig_of(df):
        srow = (df.mapInPandas(sig_fn, schema="tot double, cnt long")
                .groupBy().sum().first())
        return (float(srow[0] or 0.0), int(srow[1] or 0))

    spark = dem_cached.sparkSession
    prev_sig = None
    start_round = 0
    if ckpt is not None:
        done = ckpt.converged_round(ckpt_prefix)
        if done is not None:
            return ckpt.read_stage(
                spark, f"{ckpt_prefix}/round={done}")
        rounds = ckpt.completed_rounds(ckpt_prefix)
        if rounds:
            w_tiles = ckpt.read_stage(
                spark, f"{ckpt_prefix}/round={rounds[-1]}")
            prev_sig = sig_of(w_tiles)
            start_round = rounds[-1] + 1

    for rnd in range(start_round, max_rounds):
        strips = w_tiles.mapInPandas(emit_strips, schema=strip_schema)
        dem_w = (dem_cached.alias("d").join(
            w_tiles.alias("x"), ["ty", "tx"])
            .select("ty", "tx", F.col("d.h").alias("h"),
                    F.col("d.w").alias("w"),
                    F.col("d.data").alias("dem"),
                    F.col("x.data").alias("wdata")))
        built = (dem_w.groupBy("ty", "tx")
                 .cogroup(strips.groupBy("ty", "tx"))
                 .applyInPandas(make_flood(False), schema=TILE_SCHEMA))
        # Both branches materialize + truncate the per-round lineage
        # (the cached-only variant's logical plan grows ~3x per round
        # and every downstream action re-analyzes the whole tree —
        # measured minutes of pure planning at 8+ rounds). The ckpt
        # branch additionally persists the round + partition metrics.
        if ckpt is not None:
            new_w = ckpt.run_stage(spark, f"{ckpt_prefix}/round={rnd}",
                                   lambda: built)
        else:
            new_w = built.localCheckpoint()
        sig = sig_of(new_w)
        w_tiles = new_w
        if sig == prev_sig:
            if ckpt is not None:
                ckpt.mark_converged(ckpt_prefix, rnd)
            break
        prev_sig = sig
    return w_tiles


def _w_to_filled_long(dem_cached: DataFrame, w_tiles: DataFrame,
                      meta: RasterMeta, tile: int) -> DataFrame:
    """Final fill pass: one more tile flood emitting long form."""
    nodata = meta.nodata

    def emit(it):
        for pdf in it:
            outs = []
            for t in pdf.itertuples(index=False):
                dem_t = np.frombuffer(t.dem, dtype=np.float64).reshape(
                    t.h, t.w)
                w_t = np.frombuffer(t.wdata, dtype=np.float64).reshape(
                    t.h, t.w)
                rr, cc = np.nonzero(dem_t != nodata)
                outs.append(pd.DataFrame({
                    "row": (rr + t.ty * tile).astype(np.int32),
                    "col": (cc + t.tx * tile).astype(np.int32),
                    "filled": w_t[rr, cc]}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    dem_w = (dem_cached.alias("d").join(w_tiles.alias("x"), ["ty", "tx"])
             .select("ty", "tx", F.col("d.h").alias("h"),
                     F.col("d.w").alias("w"),
                     F.col("d.data").alias("dem"),
                     F.col("x.data").alias("wdata")))
    return dem_w.mapInPandas(emit, schema="row int, col int, filled double")


# ---------------------------------------------------------------------------
# Distributed BreachDepressions (minimax-path carving)
# ---------------------------------------------------------------------------
# The scale path for breachDepressions.go full-breach mode. The Go
# tool's carve is heap-order-dependent (back-links record whichever
# neighbor popped first among equal priorities, breachDepressions.go:
# 450-505), so — exactly as with FillDepressions — the distributed
# operator implements *specified, order-free* semantics and the
# single-partition `breach_depressions` replay keeps bit parity with
# the Go fixture behavior:
#
#   W  = epsilon=0 spill surface (priority-flood fixpoint);
#   D  = distance-to-drop inside each equal-W plateau (the classic
#        flat-resolution distance);
#   backlink(c) = the unique neighbor minimizing (W, D, z, flatindex)
#        among neighbors with (W, D) <lex (W(c), D(c)) — a
#        deterministic minimax flow tree, terminal at outlet cells
#        (any NoData / off-grid 8-neighbor);
#   carve: from every strict interior pit p walk the backlink chain to
#        an outlet carrying v := min(v, z(cell)) (v starts at z_p),
#        setting each cell to min(z, v) — the epsilon->0 limit of the
#        reference's lastValue walk (breachDepressions.go:472-505).
#
# The carved surface drains: along every walked path values are
# non-increasing, so no strict interior pit survives
# (test_breach_tiled_* asserts this plus exact equality with the
# single-node replay of the same semantics).
#
# Shuffle profile per round: O(perimeter) strips for the W and D
# fixpoints; the walker loop moves only live walker rows (#pits at
# most, shrinking as paths merge — per-cell min-v dominance drops
# dominated walkers).


def _plateau_distance_np(dem: np.ndarray, W: np.ndarray,
                         nodata: float) -> np.ndarray:
    """Single-node D: unit-distance to a W-drop (or outlet) within each
    equal-W plateau. INF never survives (every plateau has a drop)."""
    import heapq as _hq
    rows, cols = dem.shape
    valid = dem != nodata
    D = np.full((rows, cols), np.iinfo(np.int64).max, dtype=np.int64)
    heap = []
    for r in range(rows):
        for c in range(cols):
            if not valid[r, c]:
                continue
            drop = False
            for n in range(8):
                rn, cn = r + DY[n], c + DX[n]
                if not (0 <= rn < rows and 0 <= cn < cols) or \
                        not valid[rn, cn]:
                    drop = True   # outlet
                    break
                if W[rn, cn] < W[r, c]:
                    drop = True
                    break
            if drop:
                D[r, c] = 0
                _hq.heappush(heap, (0, r, c))
    while heap:
        d, r, c = _hq.heappop(heap)
        if d > D[r, c]:
            continue
        for n in range(8):
            rn, cn = r + DY[n], c + DX[n]
            if 0 <= rn < rows and 0 <= cn < cols and valid[rn, cn] \
                    and W[rn, cn] == W[r, c] and d + 1 < D[rn, cn]:
                D[rn, cn] = d + 1
                _hq.heappush(heap, (d + 1, rn, cn))
    return D


def _backlinks_np(dem: np.ndarray, W: np.ndarray, D: np.ndarray,
                  cols_global: int, nodata: float,
                  row0: int = 0, col0: int = 0) -> np.ndarray:
    """Per-cell backlink direction 0..7; -1 = outlet (terminal);
    -2 = invalid. Deterministic: argmin (W, D, z, global flatindex)
    over neighbors strictly lexicographically below in (W, D)."""
    rows, cols = dem.shape
    bl = np.full((rows, cols), -2, dtype=np.int8)
    valid = dem != nodata
    for r in range(rows):
        for c in range(cols):
            if not valid[r, c]:
                continue
            outlet = False
            best = None
            best_dir = -2
            for n in range(8):
                rn, cn = r + DY[n], c + DX[n]
                if not (0 <= rn < rows and 0 <= cn < cols) or \
                        not valid[rn, cn]:
                    outlet = True
                    break
                if (W[rn, cn], D[rn, cn]) < (W[r, c], D[r, c]):
                    key = (W[rn, cn], D[rn, cn], dem[rn, cn],
                           (row0 + rn) * cols_global + (col0 + cn))
                    if best is None or key < best:
                        best = key
                        best_dir = n
            bl[r, c] = -1 if outlet else best_dir
    return bl


def breach_minimax_np(dem: np.ndarray, nodata: float = NODATA
                      ) -> np.ndarray:
    """Single-node replay of the distributed breach semantics (the
    oracle for breach_depressions_tiled)."""
    rows, cols = dem.shape
    valid = dem != nodata
    W0 = np.where(valid, np.float64(1e308), nodata)
    halo_pad = np.full((rows + 2, cols + 2), nodata, dtype=np.float64)
    W = _tile_flood(dem, W0, halo_pad, nodata)
    D = _plateau_distance_np(dem, W, nodata)
    bl = _backlinks_np(dem, W, D, cols, nodata)
    out = dem.copy()
    for r in range(rows):
        for c in range(cols):
            if not valid[r, c] or bl[r, c] == -1:
                continue
            is_pit = True
            for n in range(8):
                rn, cn = r + DY[n], c + DX[n]
                if not valid[rn, cn] or dem[rn, cn] <= dem[r, c]:
                    is_pit = False
                    break
            if not is_pit:
                continue
            v = dem[r, c]
            rr, cc = r, c
            while True:
                v = min(v, dem[rr, cc])
                if v < out[rr, cc]:
                    out[rr, cc] = v
                d = bl[rr, cc]
                if d < 0:
                    break
                rr += DY[d]
                cc += DX[d]
    return out


def _make_emit_strips(n_ty: int, n_tx: int):
    """1-wide halo strip emitter over TILE_SCHEMA planes (shared by the
    distributed fixpoints; shuffle volume O(perimeter) per tile)."""
    from go_spatial_spark.grid import _NEIGHBOR_OFFSETS

    def emit_strips(it):
        for pdf in it:
            recs = []
            for t in pdf.itertuples(index=False):
                arr = np.frombuffer(t.data, dtype=np.float64).reshape(
                    t.h, t.w)
                for dty, dtx in _NEIGHBOR_OFFSETS:
                    nty, ntx = t.ty + dty, t.tx + dtx
                    if not (0 <= nty < n_ty and 0 <= ntx < n_tx):
                        continue
                    rs = slice(0, min(1, t.h)) if dty < 0 else (
                        slice(max(0, t.h - 1), t.h) if dty > 0
                        else slice(0, t.h))
                    cs = slice(0, min(1, t.w)) if dtx < 0 else (
                        slice(max(0, t.w - 1), t.w) if dtx > 0
                        else slice(0, t.w))
                    strip = np.ascontiguousarray(arr[rs, cs])
                    recs.append((nty, ntx, -dty, -dtx, strip.shape[0],
                                 strip.shape[1], strip.tobytes()))
            if recs:
                yield pd.DataFrame(recs, columns=[
                    "ty", "tx", "src_dty", "src_dtx", "h", "w", "data"])
    return emit_strips


_STRIPS_SCHEMA = ("ty int, tx int, src_dty int, src_dtx int, "
                  "h int, w int, data binary")


def _paste_ring(pad: np.ndarray, h: int, w: int,
                strips_pdf: pd.DataFrame) -> None:
    """Paste 1-wide neighbor strips into the ring of a (h+2, w+2) pad."""
    for srow in strips_pdf.itertuples(index=False):
        sa = np.frombuffer(srow.data, dtype=np.float64).reshape(
            srow.h, srow.w)
        dty, dtx = int(srow.src_dty), int(srow.src_dtx)
        rs = slice(0, 1) if dty < 0 else (
            slice(h + 1, h + 2) if dty > 0 else slice(1, 1 + sa.shape[0]))
        cs = slice(0, 1) if dtx < 0 else (
            slice(w + 1, w + 2) if dtx > 0 else slice(1, 1 + sa.shape[1]))
        pad[rs, cs] = sa


def breach_depressions_tiled(dem_tiles: DataFrame, meta: RasterMeta,
                             tile: int = 256, max_rounds: int = 64,
                             ckpt_dir: str | None = None) -> DataFrame:
    """Distributed BreachDepressions (full-breach, minimax-path carve).

    Semantics: see the section comment above — W spill fixpoint, D
    plateau-distance fixpoint, deterministic backlink forest, then
    walkers from every strict interior pit carve min(z, v) with
    v := min(v, z) along the chain to an outlet. Exactly equal to
    `breach_minimax_np` on the assembled grid.

    With `ckpt_dir`, every fixpoint round (W, D, walk) persists with
    per-partition row metrics and a restarted job resumes from the
    last completed round (north_rule checkpoint/resume contract).

    Returns long form (row, col, value) of the carved DEM.
    """
    spark = dem_tiles.sparkSession
    nodata = meta.nodata
    rows, cols = meta.rows, meta.cols
    n_ty = math.ceil(rows / tile)
    n_tx = math.ceil(cols / tile)
    INF = np.float64(1e308)
    from go_spatial_spark.grid import TILE_SCHEMA, tiles_to_long

    dem_cached = dem_tiles.cache()
    dem_cached.count()
    emit_strips = _make_emit_strips(n_ty, n_tx)
    import os as _os
    import time as _time
    _dbg = (print if _os.environ.get("GSS_DEBUG") else (lambda *a: None))
    _t0 = _time.time()

    ckpt = None
    if ckpt_dir is not None:
        from go_spatial_spark.checkpoint import CheckpointManager
        ckpt = CheckpointManager(ckpt_dir)

    # ---- phase A: spill surface W (shared fixpoint) -------------------
    w_tiles = _spill_w_tiles(dem_cached, meta, tile, max_rounds,
                             ckpt=ckpt, ckpt_prefix="w") \
        .localCheckpoint()
    _dbg(f"[breach] W fixpoint {_time.time()-_t0:.1f}s"); _t0 = _time.time()

    # ---- phase B: plateau distance D ---------------------------------
    # static per-tile padded W plane (W halo ring is needed every round
    # to know plateau adjacency across tile edges). One strip exchange.
    def make_wpad(key, w_pdf, strips_pdf):
        if w_pdf.empty:
            return pd.DataFrame({"ty": pd.Series(dtype="int32"),
                                 "tx": pd.Series(dtype="int32"),
                                 "h": pd.Series(dtype="int32"),
                                 "w": pd.Series(dtype="int32"),
                                 "data": pd.Series(dtype=object)})
        t = w_pdf.iloc[0]
        h, w = int(t.h), int(t.w)
        pad = np.full((h + 2, w + 2), nodata, dtype=np.float64)
        pad[1:-1, 1:-1] = np.frombuffer(
            t.data, dtype=np.float64).reshape(h, w)
        _paste_ring(pad, h, w, strips_pdf)
        return pd.DataFrame({"ty": [int(key[0])], "tx": [int(key[1])],
                             "h": [h], "w": [w], "data": [pad.tobytes()]})

    w_strips = w_tiles.mapInPandas(emit_strips, schema=_STRIPS_SCHEMA)
    wpad_tiles = (w_tiles.groupBy("ty", "tx")
                  .cogroup(w_strips.groupBy("ty", "tx"))
                  .applyInPandas(make_wpad, schema=TILE_SCHEMA)
                  ).localCheckpoint()

    def shifts8(pad):
        h, w = pad.shape[0] - 2, pad.shape[1] - 2
        return [pad[1 + DY[n]:1 + DY[n] + h, 1 + DX[n]:1 + DX[n] + w]
                for n in range(8)]

    # D0: 0 at outlets / W-drops, INF elsewhere on valid cells
    def init_d(it):
        for pdf in it:
            for t in pdf.itertuples(index=False):
                h, w = int(t.h), int(t.w)
                pad = np.frombuffer(t.data, dtype=np.float64).reshape(
                    h + 2, w + 2)
                Wt = pad[1:-1, 1:-1]
                valid = Wt != nodata
                drop = np.zeros((h, w), dtype=bool)
                for s in shifts8(pad):
                    drop |= (s == nodata) | (s < Wt)
                d0 = np.where(valid, np.where(drop, 0.0, INF), nodata)
                yield pd.DataFrame({"ty": [t.ty], "tx": [t.tx],
                                    "h": [h], "w": [w],
                                    "data": [d0.tobytes()]})

    d_tiles = wpad_tiles.mapInPandas(
        init_d, schema=TILE_SCHEMA).localCheckpoint()
    _dbg(f"[breach] wpad+initD {_time.time()-_t0:.1f}s"); _t0 = _time.time()

    def make_relax(fnodata):
        def relax(key, static_pdf, strips_pdf):
            # static: (wpad, current D); strips: neighbor D ring
            if static_pdf.empty:
                return pd.DataFrame({"ty": pd.Series(dtype="int32"),
                                     "tx": pd.Series(dtype="int32"),
                                     "h": pd.Series(dtype="int32"),
                                     "w": pd.Series(dtype="int32"),
                                     "data": pd.Series(dtype=object)})
            t = static_pdf.iloc[0]
            h, w = int(t.h), int(t.w)
            wpad = np.frombuffer(t.wpad, dtype=np.float64).reshape(
                h + 2, w + 2)
            D = np.frombuffer(t.ddata, dtype=np.float64).reshape(
                h, w).copy()
            dpad = np.full((h + 2, w + 2), INF, dtype=np.float64)
            _paste_ring(dpad, h, w, strips_pdf)
            Wt = wpad[1:-1, 1:-1]
            valid = Wt != nodata
            heap = []
            Wsh = shifts8(wpad)
            # ring-only D shifts: interior of dpad is INF (only ring
            # holds neighbor values), so relaxation from own interior
            # uses D directly below
            Dsh = shifts8(dpad)
            cand = D.copy()
            for n in range(8):
                ok = valid & (Wsh[n] == Wt) & (Dsh[n] < INF) & \
                    (Dsh[n] != nodata)
                np.minimum(cand, np.where(ok, Dsh[n] + 1.0, INF),
                           out=cand, where=valid)
            rr, cc = np.nonzero(valid & (cand < INF))
            for i in range(len(rr)):
                heapq.heappush(heap, (cand[rr[i], cc[i]],
                                      int(rr[i]), int(cc[i])))
            Dn = np.where(valid, INF, fnodata)
            while heap:
                dv, r, c = heapq.heappop(heap)
                if dv >= Dn[r, c]:
                    continue
                Dn[r, c] = dv
                for n in range(8):
                    rn, cn = r + DY[n], c + DX[n]
                    if 0 <= rn < h and 0 <= cn < w and valid[rn, cn] \
                            and Wt[rn, cn] == Wt[r, c] \
                            and dv + 1.0 < Dn[rn, cn]:
                        heapq.heappush(heap, (dv + 1.0, rn, cn))
            return pd.DataFrame({"ty": [int(key[0])],
                                 "tx": [int(key[1])],
                                 "h": [h], "w": [w],
                                 "data": [Dn.tobytes()]})
        return relax

    def sig_fn(it):
        tot = 0.0
        cnt = 0
        for pdf in it:
            for t in pdf.itertuples(index=False):
                a = np.frombuffer(t.data, dtype=np.float64)
                m = (a != nodata) & (a < INF)
                tot += float(a[m].sum())
                cnt += int(m.sum())
        yield pd.DataFrame({"tot": [tot], "cnt": [cnt]})

    def sig_of(df):
        srow = (df.mapInPandas(sig_fn, schema="tot double, cnt long")
                .groupBy().sum().first())
        return (float(srow[0] or 0.0), int(srow[1] or 0))

    prev_sig = None
    start_round = 0
    if ckpt is not None:
        done = ckpt.converged_round("d")
        if done is not None:
            d_tiles = ckpt.read_stage(spark, f"d/round={done}")
            start_round = max_rounds  # skip the loop entirely
        else:
            rounds = ckpt.completed_rounds("d")
            if rounds:
                d_tiles = ckpt.read_stage(spark, f"d/round={rounds[-1]}")
                prev_sig = sig_of(d_tiles)
                start_round = rounds[-1] + 1

    for _rnd_d in range(start_round, max_rounds):
        d_strips = d_tiles.mapInPandas(emit_strips, schema=_STRIPS_SCHEMA)
        static_wd = (wpad_tiles.alias("wp").join(
            d_tiles.alias("dd"), ["ty", "tx"])
            .select("ty", "tx", F.col("wp.h").alias("h"),
                    F.col("wp.w").alias("w"),
                    F.col("wp.data").alias("wpad"),
                    F.col("dd.data").alias("ddata")))
        built = (static_wd.groupBy("ty", "tx")
                 .cogroup(d_strips.groupBy("ty", "tx"))
                 .applyInPandas(make_relax(nodata), schema=TILE_SCHEMA))
        # materialize + truncate per-round lineage (measured: the
        # cached variant re-analyzed + partially recomputed the whole
        # chain, 13x slower per round and growing); with ckpt the round
        # also persists for resume
        if ckpt is not None:
            new_d = ckpt.run_stage(spark, f"d/round={_rnd_d}",
                                   lambda: built)
        else:
            new_d = built.localCheckpoint()
        sig = sig_of(new_d)
        d_tiles = new_d
        _dbg(f"[breach] D round sig={sig} {_time.time()-_t0:.1f}s")
        if sig == prev_sig:
            if ckpt is not None:
                ckpt.mark_converged("d", _rnd_d)
            break
        prev_sig = sig

    # ---- phase C: backlink forest + pit seeds ------------------------
    def make_backlinks(key, static_pdf, strips_pdf):
        # static: (wpad, zpad-interior dem, final D); strips: D ring
        if static_pdf.empty:
            return pd.DataFrame({"ty": pd.Series(dtype="int32"),
                                 "tx": pd.Series(dtype="int32"),
                                 "h": pd.Series(dtype="int32"),
                                 "w": pd.Series(dtype="int32"),
                                 "data": pd.Series(dtype=object)})
        t = static_pdf.iloc[0]
        ty, tx = int(key[0]), int(key[1])
        h, w = int(t.h), int(t.w)
        wpad = np.frombuffer(t.wpad, dtype=np.float64).reshape(
            h + 2, w + 2)
        zpad = np.frombuffer(t.zpad, dtype=np.float64).reshape(
            h + 2, w + 2)
        D = np.frombuffer(t.ddata, dtype=np.float64).reshape(h, w)
        dpad = np.full((h + 2, w + 2), INF, dtype=np.float64)
        dpad[1:-1, 1:-1] = D
        _paste_ring(dpad, h, w, strips_pdf)
        Wt = wpad[1:-1, 1:-1]
        valid = Wt != nodata
        r0, c0 = ty * tile, tx * tile
        # global flat index of each neighbor
        gr = np.arange(r0, r0 + h, dtype=np.int64)[:, None] + \
            np.zeros(w, dtype=np.int64)[None, :]
        gc = np.zeros(h, dtype=np.int64)[:, None] + \
            np.arange(c0, c0 + w, dtype=np.int64)[None, :]
        Wsh, Dsh, Zsh = shifts8(wpad), shifts8(dpad), shifts8(zpad)
        Dt = D
        outlet = np.zeros((h, w), dtype=bool)
        for n in range(8):
            outlet |= Wsh[n] == nodata
        bW = np.full((h, w), np.inf)
        bD = np.full((h, w), np.inf)
        bz = np.full((h, w), np.inf)
        bidx = np.full((h, w), np.iinfo(np.int64).max, dtype=np.int64)
        bdir = np.full((h, w), -2, dtype=np.int8)
        for n in range(8):
            Wn, Dn_, zn = Wsh[n], Dsh[n], Zsh[n]
            idxn = (gr + DY[n]) * np.int64(cols) + (gc + DX[n])
            mask = valid & ~outlet & (Wn != nodata) & (
                (Wn < Wt) | ((Wn == Wt) & (Dn_ < Dt)))
            better = mask & (
                (Wn < bW) | ((Wn == bW) & (
                    (Dn_ < bD) | ((Dn_ == bD) & (
                        (zn < bz) | ((zn == bz) & (idxn < bidx)))))))
            bW = np.where(better, Wn, bW)
            bD = np.where(better, Dn_, bD)
            bz = np.where(better, zn, bz)
            bidx = np.where(better, idxn, bidx)
            bdir = np.where(better, np.int8(n), bdir)
        bl = np.where(valid, np.where(outlet, np.int8(-1), bdir),
                      np.int8(-2)).astype(np.int8)
        return pd.DataFrame({"ty": [ty], "tx": [tx], "h": [h], "w": [w],
                             "data": [bl.tobytes()]})

    # zpad: padded DEM plane (same one-strip-exchange construction)
    z_strips = dem_cached.mapInPandas(emit_strips, schema=_STRIPS_SCHEMA)
    zpad_tiles = (dem_cached.groupBy("ty", "tx")
                  .cogroup(z_strips.groupBy("ty", "tx"))
                  .applyInPandas(make_wpad, schema=TILE_SCHEMA)
                  ).localCheckpoint()

    d_final_strips = d_tiles.mapInPandas(emit_strips,
                                         schema=_STRIPS_SCHEMA)
    static_wzd = (wpad_tiles.alias("wp")
                  .join(zpad_tiles.alias("zp"), ["ty", "tx"])
                  .join(d_tiles.alias("dd"), ["ty", "tx"])
                  .select("ty", "tx", F.col("wp.h").alias("h"),
                          F.col("wp.w").alias("w"),
                          F.col("wp.data").alias("wpad"),
                          F.col("zp.data").alias("zpad"),
                          F.col("dd.data").alias("ddata")))
    bl_built = (static_wzd.groupBy("ty", "tx")
                .cogroup(d_final_strips.groupBy("ty", "tx"))
                .applyInPandas(make_backlinks, schema=TILE_SCHEMA))
    if ckpt is not None:
        bl_tiles = ckpt.run_stage(spark, "backlinks", lambda: bl_built)
    else:
        bl_tiles = bl_built.localCheckpoint()
    _dbg(f"[breach] backlinks {_time.time()-_t0:.1f}s"); _t0 = _time.time()

    # pit seeds: strict interior local minima (all 8 neighbors valid
    # and strictly higher) — vectorized over the padded DEM plane
    def find_pits(it):
        for pdf in it:
            outs = []
            for t in pdf.itertuples(index=False):
                h, w = int(t.h), int(t.w)
                zpad = np.frombuffer(t.data, dtype=np.float64).reshape(
                    h + 2, w + 2)
                zt = zpad[1:-1, 1:-1]
                valid = zt != nodata
                pit = valid.copy()
                for s in shifts8(zpad):
                    pit &= (s != nodata) & (s > zt)
                rr, cc = np.nonzero(pit)
                if len(rr):
                    outs.append(pd.DataFrame({
                        "row": (rr + t.ty * tile).astype(np.int32),
                        "col": (cc + t.tx * tile).astype(np.int32),
                        "v": zt[pit]}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    worklist = zpad_tiles.mapInPandas(
        find_pits, schema="row int, col int, v double").localCheckpoint()

    # ---- phase D: walker loop ----------------------------------------
    walk_static = (dem_cached.alias("d").join(
        bl_tiles.alias("b"), ["ty", "tx"])
        .select("ty", "tx", F.col("d.h").alias("h"),
                F.col("d.w").alias("w"),
                F.col("d.data").alias("dem"),
                F.col("b.data").alias("bl"))).localCheckpoint()

    def walk_fn(key, static_pdf, walkers_pdf):
        empty = pd.DataFrame({"row": pd.Series(dtype="int32"),
                              "col": pd.Series(dtype="int32"),
                              "v": pd.Series(dtype="float64"),
                              "cont": pd.Series(dtype="bool")})
        if static_pdf.empty or walkers_pdf.empty:
            return empty
        t = static_pdf.iloc[0]
        h, w = int(t.h), int(t.w)
        dem_t = np.frombuffer(t.dem, dtype=np.float64).reshape(h, w)
        bl_t = np.frombuffer(t.bl, dtype=np.int8).reshape(h, w)
        ty, tx = int(key[0]), int(key[1])
        r0, c0 = ty * tile, tx * tile
        best: dict = {}
        rows_out = []
        order = walkers_pdf.sort_values("v")
        for rg, cg, v in zip(order["row"].to_numpy(),
                             order["col"].to_numpy(),
                             order["v"].to_numpy()):
            r, c = int(rg) - r0, int(cg) - c0
            v = float(v)
            while True:
                z = dem_t[r, c]
                if z < v:
                    v = z
                b = best.get((r, c))
                if b is not None and b <= v:
                    break          # dominated by an earlier walker
                best[(r, c)] = v
                if v < z:
                    rows_out.append((r0 + r, c0 + c, v, False))
                d = int(bl_t[r, c])
                if d < 0:
                    break          # outlet (or invalid; cannot happen)
                rn, cn = r + DY[d], c + DX[d]
                if 0 <= rn < h and 0 <= cn < w:
                    r, c = rn, cn
                else:
                    rows_out.append((r0 + rn, c0 + cn, v, True))
                    break
        if not rows_out:
            return empty
        return pd.DataFrame(rows_out,
                            columns=["row", "col", "v", "cont"])

    walk_schema = "row int, col int, v double, cont boolean"
    carve_parts = []
    start_round = 0
    if ckpt is not None:
        # resume: each completed walk round persisted its full output
        # (carves + continuations); reload carves, rebuild the live
        # worklist from the last round's continuations
        done = ckpt.converged_round("walk")
        rounds = ckpt.completed_rounds("walk")
        for k in rounds:
            prev = ckpt.read_stage(spark, f"walk/round={k}")
            carve_parts.append(prev.where(~F.col("cont"))
                               .select("row", "col", "v"))
            if k == rounds[-1] and done is None:
                worklist = (prev.where(F.col("cont"))
                            .groupBy("row", "col")
                            .agg(F.min("v").alias("v")))
        start_round = (max_rounds * max(n_ty, n_tx)) if done is not None \
            else (rounds[-1] + 1 if rounds else 0)
    for _rnd in range(start_round, max_rounds * max(n_ty, n_tx)):
        n_live = worklist.count()
        _dbg(f"[breach] walk round {_rnd} live={n_live} "
             f"{_time.time()-_t0:.1f}s"); _t0 = _time.time()
        if n_live == 0:
            if ckpt is not None:
                ckpt.mark_converged("walk", _rnd - 1)
            break
        keyed = worklist.withColumn(
            "ty", (F.col("row") / tile).cast("int")).withColumn(
            "tx", (F.col("col") / tile).cast("int"))
        built = (walk_static.groupBy("ty", "tx")
                 .cogroup(keyed.groupBy("ty", "tx"))
                 .applyInPandas(walk_fn, schema=walk_schema))
        if ckpt is not None:
            out = ckpt.run_stage(spark, f"walk/round={_rnd}",
                                 lambda: built)
        else:
            out = built.localCheckpoint()
        carve_parts.append(out.where(~F.col("cont"))
                           .select("row", "col", "v"))
        worklist = (out.where(F.col("cont"))
                    .groupBy("row", "col").agg(F.min("v").alias("v"))
                    ).localCheckpoint()

    dem_long = tiles_to_long(dem_cached, meta, tile)
    if not carve_parts:
        return dem_long
    carves = carve_parts[0]
    for p in carve_parts[1:]:
        carves = carves.unionByName(p)
    carve_min = carves.groupBy("row", "col").agg(F.min("v").alias("v"))
    return (dem_long.join(carve_min, ["row", "col"], "left")
            .select("row", "col",
                    F.least(F.col("value"), F.coalesce(
                        F.col("v"), F.col("value"))).alias("value")))


# ---------------------------------------------------------------------------
# Invariant summaries (driver-correctness gate for the replay family)
# ---------------------------------------------------------------------------
# The heap replays are bit-faithful to reference pop order, so a
# per-cell SQL oracle would have to replay the heap (tautological) —
# see oracles.py's invariant-oracle section. These helpers compute the
# checkable invariants as pure DataFrame plans over the per-cell
# outputs (no collect; equi-joins on shifted keys), so a broken
# operator turns the driver row red.


def _offsets_df(spark):
    return spark.createDataFrame(
        [(DY[n], DX[n]) for n in range(8)], "dy int, dx int")


def interior_pit_count(df: DataFrame, value_col: str,
                       alias: str = "n_interior_pits") -> DataFrame:
    """1-row count of interior pits (all 8 neighbors present and none
    strictly lower — the flat-inclusive breach seeding definition,
    breachDepressions.go:283-305) of a long-form raster. The 8-way
    neighbor lookup is an equi-join on shifted (row, col) keys."""
    spark = df.sparkSession
    off = F.broadcast(_offsets_df(spark))
    c = df.select(F.col("row").alias("r"), F.col("col").alias("c"),
                  F.col(value_col).alias("z"))
    n = df.select(F.col("row").alias("nr"), F.col("col").alias("nc"),
                  F.col(value_col).alias("nz"))
    pits = (c.crossJoin(off)
            .join(n, (F.col("nr") == F.col("r") + F.col("dy"))
                  & (F.col("nc") == F.col("c") + F.col("dx")), "left")
            .groupBy("r", "c", "z")
            .agg(F.count("nz").alias("ndeg"), F.min("nz").alias("mnz"))
            .where((F.col("ndeg") == 8) & (F.col("mnz") >= F.col("z"))))
    return pits.agg(F.count("*").alias(alias))


def fill_invariants(dem: DataFrame, meta: RasterMeta,
                    dem_tiles48, tile: int = 48) -> DataFrame:
    """Invariant summary of the exact FillDepressions replay, 1 row:

    * n_cells — valid-cell count (oracle: genuine count);
    * n_depression_cells — cells strictly below the minimax spill W,
      with W from the independent distributed fixpoint
      (fill_depressions_tiled); the oracle recomputes W via its own
      recursive CTE — a genuine cross-engine check;
    * n_lowered = 0 — an epsilon-fill never lowers a cell (out is
      z at seeds, max(z_n, out_c [+eps]) elsewhere);
    * n_below_spill = 0 — every first-touch path value is >= the
      minimax over paths, and epsilon only adds;
    * n_interior_pits = 0 — each touched cell is strictly above its
      touching neighbor, so only (edge) seeds lack a lower neighbor.
    """
    filled = fill_depressions(dem, meta)
    w = fill_depressions_tiled(dem_tiles48, meta, tile=tile) \
        .withColumnRenamed("filled", "w")
    j = (filled.join(dem, ["row", "col"]).join(w, ["row", "col"]))
    core = j.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.when(F.col("value") < F.col("w"), 1).otherwise(0)
              ).alias("n_depression_cells"),
        F.sum(F.when(F.col("filled") < F.col("value"), 1).otherwise(0)
              ).alias("n_lowered"),
        F.sum(F.when(F.col("filled") < F.col("w"), 1).otherwise(0)
              ).alias("n_below_spill"))
    return core.crossJoin(interior_pit_count(filled, "filled"))


def breach_complete_invariants(dem: DataFrame, meta: RasterMeta
                               ) -> DataFrame:
    """Invariant summary of the complete-breach replay (see
    oracles.breach_complete_invariants_sql)."""
    out = breach_depressions(dem, meta)
    j = out.join(dem, ["row", "col"])
    core = j.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.when(F.col("breached") != F.col("value"), 1).otherwise(0)
              ).alias("golden_n_changed"),
        F.sum(F.when(F.col("breached") < F.col("value"), 1).otherwise(0)
              ).alias("golden_n_lowered"),
        F.sum(F.when(F.col("breached") > F.col("value"), 1).otherwise(0)
              ).alias("golden_n_raised"))
    return (core
            .crossJoin(interior_pit_count(dem, "value", "n_pits_in"))
            .crossJoin(interior_pit_count(out, "breached")))


def breach_constrained_invariants(dem: DataFrame, meta: RasterMeta,
                                  max_depth: float, max_length: int
                                  ) -> DataFrame:
    """Invariant summary of the constrained-breach replay. The depth
    bound is computed from the DEM's own range with the reference's
    quantization constant (breachDepressions.go:328-329):
    SMALL_NUM = 1/10^(5-digits) * 10, bound = max_depth +
    (max_length+1)*SMALL_NUM (deepest legal cut plus the epsilon
    channel gradient over a full-length path)."""
    out = breach_depressions(dem, meta, max_depth=max_depth,
                             max_length=max_length, constrained=True,
                             post_breach_fill=True)
    mn, mx = dem.agg(F.min("value"), F.max("value")).first()
    digits = len(str(int(mx - mn)))
    small = 1.0 / math.pow(10, float(5 - digits)) * 10.0
    bound = max_depth + (max_length + 1) * small
    j = out.join(dem, ["row", "col"])
    core = j.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.when(F.col("value") - F.col("breached") > F.lit(bound),
                     1).otherwise(0)).alias("n_over_depth_bound"),
        F.sum(F.when(F.col("breached") != F.col("value"), 1).otherwise(0)
              ).alias("golden_n_changed")).withColumn(
        "depth_bound", F.lit(bound))
    return (core
            .crossJoin(interior_pit_count(dem, "value", "n_pits_in"))
            .crossJoin(interior_pit_count(out, "breached")))


def breach_streams_invariants(dem: DataFrame, streams: DataFrame,
                              meta: RasterMeta) -> DataFrame:
    """Invariant summary of the BreachStreams replay (see
    oracles.breach_streams_invariants_sql)."""
    out = breach_streams(dem, streams, meta)
    j = out.join(dem, ["row", "col"])
    core = j.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.when(F.col("breached") != F.col("value"), 1).otherwise(0)
              ).alias("golden_n_changed"),
        F.sum(F.when(F.col("breached") < F.col("value"), 1).otherwise(0)
              ).alias("golden_n_lowered"),
        F.sum(F.when(F.col("breached") > F.col("value"), 1).otherwise(0)
              ).alias("golden_n_raised"))
    streams_cnt = streams.agg(F.count("*").alias("n_stream_cells"))
    return (core.crossJoin(streams_cnt)
            .crossJoin(interior_pit_count(out, "breached")))


def fd8_invariants(dem_tiles48, meta: RasterMeta, tile: int = 48
                   ) -> DataFrame:
    """Invariant summary of distributed FD8. The headwater set (no
    strictly-higher valid 8-neighbor) is computed from the DEM itself
    — NOT inferred from ``accum == 1.0``: a cell whose only inflow is
    below ~1 ulp of 1.0 would round ``1.0 + inflow`` back to 1.0 and
    be miscounted as a headwater, so float saturation can inflate the
    count on a non-dyadic DEM. On true headwaters accum IS exactly 1.0
    (no inflow terms at all), so ``n_head_accum_mismatch == 0`` is a
    safe one-directional check; ``accum < 1`` is impossible (loads
    non-negative, every valid cell starts at 1)."""
    from go_spatial_spark.grid import tiles_to_long
    acc = fd8_flow_accum(dem_tiles48, meta, tile=tile)
    dem = tiles_to_long(dem_tiles48, meta, tile=tile)
    offs = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)])
    e = dem.select("row", "col", "value", F.explode(offs).alias("o"))
    nbr = dem.select(F.col("row").alias("nr"), F.col("col").alias("nc"),
                     F.col("value").alias("nz"))
    head = (e.join(nbr, (F.col("nr") == F.col("row") + F.col("o.dy"))
                   & (F.col("nc") == F.col("col") + F.col("o.dx")), "left")
            .groupBy("row", "col")
            .agg(F.max(F.when(F.col("nz") > F.col("value"), 1)
                       .otherwise(0)).alias("has_higher"))
            .where(F.col("has_higher") == 0)
            .select("row", "col"))
    head_stats = (head.join(acc, ["row", "col"])
                  .agg(F.count("*").alias("n_headwater"),
                       F.sum(F.when(F.col("accum") != 1.0, 1).otherwise(0)
                             ).alias("n_head_accum_mismatch")))
    return acc.agg(
        F.count("*").alias("n_cells"),
        F.sum(F.when(F.col("accum") < 1.0, 1).otherwise(0)
              ).alias("n_below_one")).crossJoin(head_stats)
