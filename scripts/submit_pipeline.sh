#!/usr/bin/env bash
# Package the engine and run the flagship pipeline via spark-submit
# --py-files (north_rule deployment shape). MASTER defaults to
# local[8] in-sandbox; on a real cluster pass e.g.
#   MASTER=yarn EXTRA="--num-executors 200 --executor-cores 4" ...
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local[8]}"
INPUT="${INPUT:-/root/testdata/sf0.01}"
OUT="${OUT:-/tmp/gss_pipeline_out}"
CKPT="${CKPT:-/tmp/gss_pipeline_ckpt}"
EXTRA="${EXTRA:-}"

mkdir -p dist
rm -f dist/go_spatial_spark.zip
(cd . && zip -qr dist/go_spatial_spark.zip go_spatial_spark \
    -x 'go_spatial_spark/__pycache__/*' 'go_spatial_spark/*/__pycache__/*')

exec spark-submit \
    --master "$MASTER" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.python.daemon.module=go_spatial_spark.daemon \
    --py-files dist/go_spatial_spark.zip \
    $EXTRA \
    scripts/run_pipeline.py \
    --input "$INPUT" --checkpoint-dir "$CKPT" --output "$OUT"
