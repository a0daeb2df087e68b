#!/usr/bin/env bash
# Cluster deploy shape (north_rule): package the engine and run the
# extraction job via spark-submit --py-files on a multi-executor
# cluster.  In the sandbox the same packaging path is exercised by
# __spark_entry__._ensure_pkg (addPyFile of the identical zip).
#
# Usage: tools/submit.sh <input_table_or_path> <output_path> [executors]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="${1:?input table/path}"
OUTPUT="${2:?output path}"
EXECUTORS="${3:-250}"

ZIP="$(mktemp -d)/vision_parse_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" vision_parse_spark -i '*.py')

spark-submit \
  --py-files "$ZIP" \
  --num-executors "$EXECUTORS" \
  --executor-cores 4 \
  --executor-memory 8g \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 8)) \
  --conf spark.sql.files.maxPartitionBytes=128m \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
  "$REPO/tools/run_extract_job.py" "$INPUT" "$OUTPUT"
