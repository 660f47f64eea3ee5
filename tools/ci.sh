#!/usr/bin/env bash
# Repo exit-checklist: run EVERYTHING the round's claims rest on, in the
# order that fails fastest, and leave a committable gate artifact.
#
#   tools/ci.sh [gate-json-path]     (default: GATE_local.json)
#
# 1. pytest            — unit/property/plan/pipeline suites (~8 min)
# 2. check_oracle.py   — ALL queries() vs DuckDB oracles at the driver
#                        default sf0.01, writing the per-query JSON that
#                        BASELINE.md/COVERAGE.md claims must match
# 3. flagship smoke    — the driver's entry() call shape
#
# Do NOT run while bench.py is measuring (host contention corrupts the
# steal-gated scaling pairs — see BENCH.md).
set -euo pipefail
cd "$(dirname "$0")/.."

GATE_OUT="${1:-GATE_local.json}"

python -m pytest tests/ -x -q

GATE_JSON="$GATE_OUT" python tools/check_oracle.py

python - <<'EOF'
import __spark_entry__ as m
from log_parser_spark.session import get_spark

spark = get_spark(cores=8, shuffle_partitions=8)
df = m.entry(spark)
n = df.count()
assert n >= 0
print(f"flagship smoke: {n} rows, schema {df.schema.simpleString()[:120]}...")
spark.stop()
EOF

echo "CI green — gate artifact: $GATE_OUT"
