#!/usr/bin/env bash
# DuckDB comparator for the grow5 set (same SQL, ORACLE_BENCH_TIMEOUT
# bounds the naive-recompute oracles that explode at 10x/100x).
set -euo pipefail
cd "$(dirname "$0")/../.."
TAG="$1"; DIR="$2"
QUERIES="q38_salted_join t06_minhash_lsh_pairs t08_ngram_jaccard_pairs t41_graph_pagerank t76_exact_probe_neardup"
OUT="dev/scale_experiment_r14/duckdb_grow5_${TAG}.json"
if [[ -s "$OUT" ]]; then echo "== $OUT exists, skipping"; exit 0; fi
ORACLE_BENCH_TIMEOUT="${ORACLE_BENCH_TIMEOUT:-300}" \
  python3 dev/oracle_bench.py "$DIR" dev/scale_experiment_r14/oracle_sql.json $QUERIES > "$OUT"
echo "== wrote $OUT"; tail -c 400 "$OUT"
