#!/usr/bin/env bash
# Deploy-and-run via spark-submit --py-files (north_rule deployment contract).
#
# Packages the pure-Python engine into a zip and submits the encode job to
# whatever master is given (default local[8]); on a real cluster pass e.g.
#   MASTER=yarn ./bench/submit.sh --input hdfs://.../corpus.parquet
# The engine has no native deps beyond the executors' numpy/pyarrow, so the
# one zip is the entire deployment artifact.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${MASTER:-local[8]}"
CPUS="${CPUS:-8}"
ZIP="$(mktemp -d)/parquet_extra_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" parquet_extra_spark -x '*__pycache__*')
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO/bench/encode_job.py" --cpus "$CPUS" "$@"
