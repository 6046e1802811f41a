#!/usr/bin/env bash
# Round-16 stretch (judge ask #6): prove the NO_BROADCAST_HASH guard
# survives AQE's runtime re-plan across REAL executor boundaries.
# local[32] shares one JVM (broadcast = in-process reference); a
# logical hint that AQE dropped at runtime re-plan would be invisible
# there. local-cluster[2,8,16384] forks two real worker JVMs — real
# closure serialization, real broadcast transport — and graft.ExplainFinal
# EXECUTES each query under AQE and prints the FINAL adaptive plan, so
# "the guarded joins stayed SMJ under runtime re-planning on a real
# topology" is read off the artifact.
#
# Queries: t76 (exact probe) on the 10x SKEW replica — the shape whose
# three broadcast hazards the guard exists for — and t52 (ppjoin) on
# 10x uniform (its guarded verify joins + the r16 window collapse).
#
# Usage: dev/scale_experiment_r16/run_cluster_guard_drill.sh
set -uo pipefail
cd "$(dirname "$0")/../.."
OUT=dev/scale_experiment_r16
sbt -batch package >/dev/null 2>&1 || true
JAR=$(ls target/scala-2.13/tingdataetlspark_*.jar | head -1)
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="local-cluster[2,8,16384]"
export SPARK_GRAFT_JARS="file:$(readlink -f "$JAR")"
export SPARK_GRAFT_CPUS=16   # 2 workers x 8 cores

drill() {
  local name="$1" sfdir="$2" query="$3"
  local plan="$OUT/${name}_cluster_finalplan.txt"
  if [[ -s "$plan" ]]; then echo "== $plan exists, skipping"; return; fi
  echo "== cluster drill $name on $sfdir ($(date +%H:%M:%S))"
  # executor memory is NOT the local-cluster worker-capacity param —
  # it defaults to 1g (the first drill attempt died OOM in the t76
  # explode at 10x); 14g fits the 16384MB worker capacity
  SPARK_GRAFT_SF_DIR="$sfdir" \
    /opt/spark/bin/spark-submit --class graft.ExplainFinal \
      --master "$SPARK_GRAFT_MASTER" \
      --driver-memory 16g \
      --conf spark.executor.memory=14g \
      --conf spark.ui.enabled=false \
      "$JAR" "$query" 2> "$OUT/${name}_cluster_drill.log" \
    | tr '\000' '.' > "$plan"
  # ^ the ppJoin collapse key uses a NUL separator literal, which the
  #   plan dump renders verbatim — strip it so the artifact greps as text
  echo "   rows: $(grep '^rows:' "$plan" | head -1)"
  echo "   SMJ nodes: $(grep -c 'SortMergeJoin' "$plan" || true)," \
       "BHJ nodes: $(grep -c 'BroadcastHashJoin' "$plan" || true)"
  if grep -qiE "maxResultSize|Cannot broadcast" "$OUT/${name}_cluster_drill.log"; then
    echo "   !! BROADCAST-PATH ERROR in log — guard failed on cluster topology"
  fi
}

# _ppjoin_plan drives the t52 join tree via the lazy ppJoinPairsPlan
# seam: the registry entry's own plan is a parquet scan of the shared
# pair artifact, so the guarded joins are invisible through it
drill t52_10x /tmp/scale10x _ppjoin_plan
drill t76_10x_skew /tmp/scale10x_skew t76_exact_probe_neardup
echo "== drill done"
