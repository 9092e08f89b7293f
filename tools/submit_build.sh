#!/usr/bin/env bash
# Cluster submission wrapper: package the engine and run the index build via
# spark-submit --py-files (the north rule's deployment shape). On a real
# cluster add --master/--num-executors/--executor-cores as usual; defaults
# below reproduce the sandbox run.
set -euo pipefail

TRANSCRIPTS=${1:?usage: submit_build.sh <transcripts_path> <warehouse_path> [master]}
WAREHOUSE=${2:?usage: submit_build.sh <transcripts_path> <warehouse_path> [master]}
MASTER=${3:-local[*]}

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/engine.zip"
(cd "$ROOT" && zip -qr "$ZIP" kafka_elasticsearch_standalone_consumer_spark)

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$ROOT/tools/run_build.py" "$TRANSCRIPTS" "$WAREHOUSE"
