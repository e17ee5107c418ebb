"""Global-statistics operators: Quantiles (histogram-approximated
ntile), global min/max/histogram plumbing.

Quantiles reproduces tools/quantiles.go:163-280 exactly:
  valueRange = ceil(max - min); binSize = valueRange / 10000
  bin = min(floor((z - min)/binSize), 9999)
  cdf[bin] = 100 * cumulative_count / n
  class = floor(cdf / (100/numBins)), clamped to numBins-1; output +1

The 10k-bin histogram is a fixed-size aggregate: groupBy(bin).count()
shuffles 10k rows regardless of input scale, the bin->class map is
built driver-side (NumPy, identical float ops) and broadcast back —
the same two-pass shape the reference uses, distributed.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

HIGH_RES_BINS = 10000


def quantiles(grid: DataFrame, num_bins: int = 5,
              value_col: str = "value") -> DataFrame:
    spark = grid.sparkSession
    mn, mx, n = grid.agg(
        F.min(value_col), F.max(value_col), F.count(value_col)).first()
    value_range = math.ceil(mx - mn)
    bin_size = value_range / float(HIGH_RES_BINS)

    binned = grid.withColumn(
        "bin",
        F.least(F.floor((F.col(value_col) - F.lit(mn)) / F.lit(bin_size)),
                F.lit(HIGH_RES_BINS - 1)))
    hist = binned.groupBy("bin").count().toPandas()

    counts = np.zeros(HIGH_RES_BINS, dtype=np.int64)
    counts[hist["bin"].to_numpy(dtype=np.int64)] = hist["count"].to_numpy()
    cum = counts.cumsum()
    cdf = 100.0 * cum.astype(np.float64) / float(n)
    qp = 100.0 / float(num_bins)
    cls = np.floor(cdf / qp).astype(np.int64)
    cls[cls == num_bins] = num_bins - 1

    mapping = spark.createDataFrame(
        [(int(b), int(c) + 1) for b, c in enumerate(cls)],
        "bin long, quantile int")
    return (binned.join(F.broadcast(mapping), "bin")
            .select("row", "col", "quantile"))


def quantiles_oracle_sql(dem_sql: str, num_bins: int = 5) -> str:
    return f"""
    WITH dem AS ({dem_sql}),
    s AS (SELECT min(value) AS mn, max(value) AS mx,
                 count(*) AS n FROM dem),
    bz AS (SELECT mn, n, ceil(mx - mn) / {float(HIGH_RES_BINS)} AS bs FROM s),
    b AS (SELECT row, col,
                 least(CAST(floor((value - mn) / bs) AS BIGINT),
                       {HIGH_RES_BINS - 1}) AS bin
          FROM dem, bz),
    h AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
    cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cumc FROM h),
    cls AS (SELECT bin,
              CAST(CASE WHEN floor((100.0 * cumc / n) / (100.0 / {num_bins}))
                             = {num_bins}
                        THEN {num_bins - 1}
                        ELSE floor((100.0 * cumc / n) / (100.0 / {num_bins}))
                   END AS INT) + 1 AS quantile
            FROM cum, bz)
    SELECT b.row, b.col, cls.quantile FROM b JOIN cls USING (bin)
    """
