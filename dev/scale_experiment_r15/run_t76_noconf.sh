#!/usr/bin/env bash
# The round-15 no-override proof for the broadcast-twilight-zone guard:
# rerun t76 (exact probe) SOLO on the 100x-skew replica with ZERO conf
# overrides — default driver.maxResultSize (1g), default
# autoBroadcastJoinThreshold. Heap is pinned to T76_MEM (48g, same as
# the grow runs): heap is the machine's size, not the variable under
# test — a 1g-default JVM dies in the vectorized parquet reader before
# any join plan gets exercised. Round 14 needed maxResultSize=8g /
# autoBroadcastJoinThreshold=-1 to get past the planner broadcasting
# the 658M-row candidate relation; with Dedup.noBroadcastPairs in the
# engine the verify joins must plan as shuffle joins unconditionally.
#
# The run is still ALLOWED to die on disk — verifying 0.66G candidate
# pairs carries both shingle arrays across a shuffle, a ~TB spill this
# box cannot host (the honest single-node ceiling, r14's measured
# finding). What must NOT happen is a broadcast-path death
# (maxResultSize / "Cannot broadcast" row cap). A disk watchdog kills
# the run before the box fills (same guard the r14 run lacked).
#
# Usage: dev/scale_experiment_r15/run_t76_noconf.sh [sfDir] [minFreeGB]
set -uo pipefail
cd "$(dirname "$0")/../.."
DIR="${1:-/tmp/scale100x_skew}"
MINFREE="${2:-14}"
JAR=$(ls target/scala-2.13/tingdataetlspark_*.jar | head -1)
OUT="dev/scale_experiment_r15/t76_100x_skew_noconf"
LOG="/tmp/t76_noconf.log"
echo "== t76 no-override rerun on $DIR (watchdog: kill under ${MINFREE}GB free)"
# step 1: the PLAN evidence — graft.Explain prints t76's formatted
# physical plan at this scale under default confs (no AQE, default
# threshold, real artifact stats). The verify joins must show as
# SortMergeJoin/ShuffledHashJoin with no BroadcastExchange under the
# candidate side. (Artifact builds run during planning — the execution
# contract — so this also pre-builds the shared tables for step 2.)
PLAN="dev/scale_experiment_r15/t76_100x_skew_noconf_plan.txt"
if [[ ! -s "$PLAN" ]]; then
  SPARK_GRAFT_SF_DIR="$DIR" \
    /opt/spark/bin/spark-submit --class graft.Explain --master 'local[32]' \
      --conf spark.ui.enabled=false "$JAR" t76_exact_probe_neardup \
      > "$PLAN" 2>&1 || true
  echo "== plan written: $PLAN ($(grep -c 'SortMergeJoin' "$PLAN" || true) SMJ nodes)"
fi
# step 2: the execution attempt (fresh JVM — artifacts are per-process,
# so this run rebuilds its own; solo protocol, builds included)
SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_BENCH_OUT="${OUT}.json" \
  /opt/spark/bin/spark-submit --class graft.Bench --master 'local[32]' \
    --driver-memory "${T76_MEM:-48g}" \
    --conf spark.ui.enabled=false \
    "$JAR" t76_exact_probe_neardup > "$LOG" 2>&1 &
PID=$!
KILLED=""
while kill -0 "$PID" 2>/dev/null; do
  FREE=$(df --output=avail -BG /tmp | tail -1 | tr -dc '0-9')
  if [[ "$FREE" -lt "$MINFREE" ]]; then
    echo "== disk watchdog: ${FREE}GB free < ${MINFREE}GB — killing run"
    KILLED="disk-watchdog"
    kill -9 "$PID"
    break
  fi
  sleep 10
done
wait "$PID" 2>/dev/null
RC=$?
# triage the outcome: broadcast-path deaths are guard FAILURES;
# disk/watchdog deaths are the documented ceiling; exit 0 is a full run
if grep -qiE "maxResultSize|Cannot broadcast|BroadcastExchange.*(failed|error)|broadcast.*rows.*exceed" "$LOG"; then
  echo "== RESULT: BROADCAST-PATH DEATH — the guard FAILED"; STATUS=broadcast_death
elif [[ -n "$KILLED" ]]; then
  echo "== RESULT: killed by disk watchdog (the honest ceiling, reached safely)"; STATUS=disk_watchdog
elif grep -qiE "No space left on device" "$LOG"; then
  echo "== RESULT: died on disk (the honest ceiling)"; STATUS=disk_full
elif [[ "$RC" -eq 0 ]]; then
  echo "== RESULT: completed"; STATUS=completed
else
  echo "== RESULT: other failure (rc=$RC) — inspect $LOG"; STATUS=other
fi
tail -5 "$LOG"
# keep a bounded excerpt in-repo: the plan-relevant lines + the tail
{ grep -nE "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|maxResultSize|Cannot broadcast|No space left" "$LOG" | head -40;
  echo "---- tail ----"; tail -100 "$LOG"; } > "${OUT}.log" 2>/dev/null || true
echo "{\"status\":\"$STATUS\",\"rc\":$RC,\"sf\":\"$DIR\"}" > "${OUT}_status.json"
echo "== wrote ${OUT}_status.json (log: ${OUT}.log)"
