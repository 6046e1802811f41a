#!/usr/bin/env bash
# DuckDB comparator for the grow3 set (same SQL; ORACLE_BENCH_TIMEOUT
# bounds the naive-recompute oracles that explode at 10x/100x). Never
# run concurrently with a timed Spark run (r14 contention lesson).
set -euo pipefail
cd "$(dirname "$0")/../.."
TAG="$1"; DIR="$2"
QUERIES="t67_bpe_train t46_cc_star_contraction t52_ppjoin_exact"
OUT="dev/scale_experiment_r15/duckdb_grow3_${TAG}.json"
if [[ -s "$OUT" ]]; then echo "== $OUT exists, skipping"; exit 0; fi
ORACLE_BENCH_TIMEOUT="${ORACLE_BENCH_TIMEOUT:-300}" \
  python3 dev/oracle_bench.py "$DIR" dev/scale_experiment_r15/oracle_sql.json $QUERIES > "$OUT"
echo "== wrote $OUT"; tail -c 400 "$OUT"
