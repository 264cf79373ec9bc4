#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit deployment (north rule).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f parzig_spark.zip
zip -qr parzig_spark.zip parzig_spark -x '*__pycache__*'
echo "wrote $(pwd)/parzig_spark.zip ($(du -h parzig_spark.zip | cut -f1))"
echo "usage: spark-submit --py-files parzig_spark.zip jobs/encode_job.py --help"
