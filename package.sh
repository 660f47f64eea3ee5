#!/usr/bin/env bash
# Build the spark-submit artifact (north rule: --py-files on a multi-executor
# cluster). Produces dist/log_parser_spark.zip + copies main.py.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/log_parser_spark.zip
zip -qr dist/log_parser_spark.zip log_parser_spark \
    -x "*/__pycache__/*" -x "*.pyc"
cp main.py dist/
echo "dist/log_parser_spark.zip + dist/main.py"
echo "submit: spark-submit --master yarn --deploy-mode cluster \\"
echo "  --py-files dist/log_parser_spark.zip dist/main.py \\"
echo "  --dataset <token-table> --out <report-root> --recorddate YYYY-MM-DD"
