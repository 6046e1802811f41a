#!/usr/bin/env bash
# Round-15 growth-exponent experiment: SOLO focused graft.Bench runs of
# the ITERATIVE/STATEFUL tier (t67 BPE train, t46 CC star-contraction,
# t52 PPJoin) at 1x / 10x / 100x uniform — the r14 protocol (one JVM
# per scale, solo numbers include the subset's artifact builds, so
# growth factors compare like-for-like). spark-submit with the
# `sbt package` jar so runs don't contend with sbt.
#
# NO conf overrides beyond heap: the broadcast-twilight-zone guard is
# in the engine now (Dedup.noBroadcastPairs), so these runs double as
# the no-override proof for the verify-join plans. t46's convergence
# rounds ride graph diameter — the bench artifact's `iters` field
# records them per scale (a superlinear wall with FLAT rounds is data
# slope; growing rounds is the diameter mode).
#
# Usage: dev/scale_experiment_r16/run_spark.sh <tag> <sfDir>
#   tag in {1x, 10x_uniform, 100x_uniform}
set -euo pipefail
cd "$(dirname "$0")/../.."
TAG="$1"; DIR="$2"
QUERIES="t67_bpe_train t46_cc_star_contraction t52_ppjoin_exact"
OUT="dev/scale_experiment_r16/spark_grow3_${TAG}.json"
if [[ -s "$OUT" ]]; then echo "== $OUT exists, skipping"; exit 0; fi
JAR=$(ls target/scala-2.13/tingdataetlspark_*.jar | head -1)
echo "== spark grow3 $TAG ($DIR)"
SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_BENCH_OUT="$OUT" \
  /opt/spark/bin/spark-submit --class graft.Bench --master 'local[32]' \
    --driver-memory "${GROW3_MEM:-48g}" \
    --conf spark.ui.enabled=false \
    "$JAR" $QUERIES 2>&1 | grep -E '^\[bench\]|"metric"' | tail -3
echo "== wrote $OUT"
