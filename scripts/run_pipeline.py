"""spark-submit job entry for the flagship pipeline (north_rule: "run
via spark-submit --py-files on a multi-executor cluster").

The script is cluster-agnostic: it takes whatever master/executor
topology spark-submit gives it (no .master() call), reads the documents
table, runs extract -> geocode/cells (salted) -> PIP, and writes the
join pairs + per-stage checkpoints.

Usage (see scripts/submit_pipeline.sh for the packaged invocation):

    spark-submit --py-files dist/go_spatial_spark.zip \
        scripts/run_pipeline.py \
        --input  /root/testdata/sf0.01 \
        --checkpoint-dir /tmp/gss_ckpt \
        --output /tmp/gss_out
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory containing documents.parquet")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    # No .master(): spark-submit supplies the cluster. AQE + Arrow are
    # the same settings session.py uses for local testing.
    spark = (SparkSession.builder.appName("gss-flagship-pipeline")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())

    from go_spatial_spark.pipeline import flagship_pipeline

    t0 = time.perf_counter()
    pairs = flagship_pipeline(spark, args.input, args.checkpoint_dir)
    pairs.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"[run_pipeline] wrote {n} PIP pairs to {args.output} "
          f"in {time.perf_counter() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
