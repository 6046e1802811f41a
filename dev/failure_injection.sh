#!/usr/bin/env bash
# Failure-injection rehearsal: run the iterative family under
# local-cluster[2,4,4096] with RELIABLE storage checkpoints and SIGKILL
# one executor JVM mid-run — the 100 TB node-loss drill. Spark must
# (a) notice the lost executor, (b) relaunch it via the standalone
# Worker, (c) reschedule the lost tasks from the STORAGE checkpoint
# (lineage is truncated at each iteration — recomputation restarts from
# the last checkpoint, not from round 0), and the output must stay
# hash-identical under the DuckDB gate.
#
# Usage: dev/failure_injection.sh [sfDir] [outDir] [killDelaySec] [q...]
#   default queries: the iterative six + t79 (the reliable-checkpoint
#   family) — at sf0.1 the run is long enough that a mid-run kill lands
#   inside an iterative stage.
#
# Artifacts: $OUT_DIR/driver.log (kill visible as "Lost executor"),
#   $OUT_DIR/events/ (structured event log: ExecutorRemoved +
#   Resubmitted/relaunch evidence), dev/check.py verdict on stdout.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
OUT_DIR="${2:-/tmp/vout_failure}"
KILL_DELAY="${3:-45}"
shift $(( $# > 3 ? 3 : $# )) || true
QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(t09_neardup_resolve t41_graph_pagerank t46_cc_star_contraction
           t52_ppjoin_exact t67_bpe_train t71_pagerank_dangling
           t79_bpe_vocab_target)
fi

sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/*.jar | head -1)

export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="local-cluster[2,4,4096]"
export SPARK_GRAFT_JARS="file:$(readlink -f "$JAR")"
export SPARK_GRAFT_CPUS=8          # 2 workers x 4 cores
export SPARK_GRAFT_CHECKPOINT=reliable
export SPARK_GRAFT_CHECKPOINT_DIR="${SPARK_GRAFT_CHECKPOINT_DIR:-/tmp/graft_ckpt_failure}"
mkdir -p "$SPARK_GRAFT_CHECKPOINT_DIR"
rm -rf "$OUT_DIR"; mkdir -p "$OUT_DIR/events"
export SPARK_GRAFT_EXTRA_CONF="spark.eventLog.enabled=true;spark.eventLog.dir=file:$OUT_DIR/events"

echo "== starting graft.Verify (${QUERIES[*]}) on $SPARK_GRAFT_MASTER"
( sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR ${QUERIES[*]}" \
    >"$OUT_DIR/driver.log" 2>&1 ) &
DRIVER_PID=$!

# wait for forked executor JVMs, then SIGKILL one mid-iteration
KILLED=""
for i in $(seq 1 300); do
  sleep 1
  mapfile -t EXECS < <(pgrep -f CoarseGrainedExecutorBackend || true)
  if [ ${#EXECS[@]} -ge 2 ] && [ "$i" -ge "$KILL_DELAY" ] && [ -z "$KILLED" ]; then
    VICTIM=${EXECS[0]}
    echo "== t+${i}s: SIGKILL executor JVM pid $VICTIM (of ${#EXECS[@]})"
    kill -9 "$VICTIM" && KILLED=$VICTIM
    break
  fi
  # driver already done? (run too short for the delay)
  kill -0 $DRIVER_PID 2>/dev/null || break
done
[ -n "$KILLED" ] || echo "WARNING: no executor killed (run finished first?)"

wait $DRIVER_PID || { echo "DRIVER FAILED — see $OUT_DIR/driver.log"; exit 1; }

echo "== driver survived; kill evidence:"
grep -E "Lost executor|ExecutorLostFailure|Resubmit|FetchFailed" \
  "$OUT_DIR/driver.log" | sort | uniq -c | head -10 || true
echo "== event-log evidence:"
grep -ho '"Event":"[^"]*"' "$OUT_DIR"/events/* 2>/dev/null | sort | uniq -c \
  | grep -E "ExecutorRemoved|ExecutorAdded|TaskEnd|JobEnd" || true

echo "== DuckDB gate on the surviving output:"
python3 dev/check.py "$SF_DIR" "$OUT_DIR" "${QUERIES[@]}"
