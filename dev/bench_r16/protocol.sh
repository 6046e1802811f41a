#!/usr/bin/env bash
# Round-16 bench protocol (the r13–r15 discipline): four full
# graft.Bench runs at sf0.1 interleaved with three same-window
# oracle_bench.py comparator runs on the identical 205-query SQL, plus
# the previous-round-HEAD control (r15 code, worktree of the r15 judge
# commit 99fbbf1 at /tmp/r15head) benched once in the SAME window. All
# runs published; the committed bench.json is the median warm run.
#
# New this round: every bench JSON carries a `host_sentinel` field — a
# fixed splitmix64 CPU microbench (single-thread + 32-thread) timed
# before the warmup and after the last query, so a hostile window is
# READ off the artifact (sentinel inflated, DuckDB flat) instead of
# diagnosed post-hoc. The r15-code control lacks the field (it predates
# it) — its window is vouched for by the interleaved runs around it.
#
# Attribution question this round: the ppJoin collapse re-key (window
# over hash60-prefixed key instead of the array-keyed membership SMJ —
# t52/t06/t08-family), the streaming verify-corpus pin/broadcast seam
# (t72/t32/t34/t74/t76/t77/t78 batch twins got the candidate-side
# guard), and the probeBounded tripwire (one capped count per bounded
# call) all landed since r15.
set -euo pipefail
cd "$(dirname "$0")/../.."
OUT=dev/bench_r16
ORACLE_SQL=dev/scale_experiment_r14/oracle_sql.json

spark_run() {
  local name="$1" dir="${2:-.}"
  echo "== spark $name ($(date +%H:%M:%S))"
  (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT="/root/repo/$OUT/$name.json" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep -E '^\[bench\]' | tail -3)
  python3 -c "import json; d=json.load(open('$OUT/$name.json')); print(' ', round(d['value'],1), 's,', len(d['queries']), 'queries,', d['failed'], 'sentinel:', d.get('host_sentinel',{}))"
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
spark_run bench_r15code_samewindow /tmp/r15head
echo "== protocol done"
