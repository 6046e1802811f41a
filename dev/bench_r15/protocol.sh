#!/usr/bin/env bash
# Round-15 bench protocol (the r13/r14 discipline): four full
# graft.Bench runs at sf0.1 interleaved with three same-window
# oracle_bench.py comparator runs on the identical 205-query SQL, plus
# the previous-round-HEAD control (r14 code, worktree of the r14 judge
# commit at /tmp/r14head) benched once in the SAME window. All runs
# published; the committed bench.json is the median warm run.
#
# This round's attribution question: the broadcast-guard hints
# (Dedup verify joins now carry NO_BROADCAST_HASH) and the fixpoint
# iteration logging landed since r14 — the control isolates their
# sf0.1 cost (t76/t74/t06/t08/t52 entries are where a forced-shuffle
# regression would show).
set -euo pipefail
cd "$(dirname "$0")/../.."
OUT=dev/bench_r15
ORACLE_SQL=dev/scale_experiment_r14/oracle_sql.json

spark_run() {
  local name="$1" dir="${2:-.}"
  echo "== spark $name ($(date +%H:%M:%S))"
  (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT="/root/repo/$OUT/$name.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E '^\[bench\]' | tail -1)
  python3 -c "import json; d=json.load(open('$OUT/$name.json')); print(' ', round(d['value'],1), 's,', len(d['queries']), 'queries,', d['failed'])"
}

duck_run() {
  local name="$1"
  echo "== duckdb $name ($(date +%H:%M:%S))"
  python3 dev/oracle_bench.py /root/testdata/sf0.1 "$ORACLE_SQL" > "$OUT/$name.json"
  python3 -c "import json; d=json.load(open('$OUT/$name.json')); print(' ', round(d['value'],1), 's,', d['n'], 'queries,', d['timeouts'])"
}

spark_run bench_run1
duck_run duckdb_run1
spark_run bench_run2
duck_run duckdb_run2
spark_run bench_run3
duck_run duckdb_run3
spark_run bench_run4
spark_run bench_r14code_samewindow /tmp/r14head
echo "== protocol done"
