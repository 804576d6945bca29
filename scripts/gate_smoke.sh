#!/bin/sh
# Gate-budget smoke tier (VERDICT r6 #6): prove every oracle SQL in
# SparkEntry.oracleSql parses and completes under a per-query time cap
# at sf0.001, so a pathological oracle (the DuckDB CTE-inlining
# explosion class — hit three times now, most recently text_bpe_learn
# at >650 s) is caught at commit time, not at the driver. Dumps only
# oracle_sql.json (the ONLY filter matches zero queries, so no Spark
# query runs), then executes the SQL set on a worker pool with
# interrupt watchdogs. Exit 0 = every oracle inside budget.
#
# Usage: scripts/gate_smoke.sh [out_dir] [sf_dir] [cap_sec]
set -e
OUT=${1:-/tmp/gate_smoke}
SF=${2:-/root/testdata/sf0.001}
CAP=${3:-30}
mkdir -p "$OUT"
SPARK_GRAFT_ONLY=__oracle_json_only__ SPARK_GRAFT_CPUS=4 \
  sbt -batch "runMain graft.Verify $SF $OUT" >/dev/null 2>&1
python3 "$(dirname "$0")/check.py" "$OUT" "$SF" --oracle-only \
  --timeout "$CAP"
