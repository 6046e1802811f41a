#!/usr/bin/env bash
# Cluster-topology smoke: run graft.Verify under local-cluster[2,4,4096]
# — two REAL worker JVMs (separate executor processes, real closure
# serialization, real broadcast transport), the cheapest check for what
# local[N] structurally hides. Results must be hash-identical to the
# local-mode run (the driver's DuckDB gate adjudicates: run
# dev/check.py on the out dir afterwards).
#
# Usage: dev/local_cluster_verify.sh [sfDir] [outDir] [query ...]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/vout_cluster}"
shift $(( $# > 2 ? 2 : $# )) || true

# executors are separate JVMs launched from the Spark dist — they need
# the graft classes as a jar (sbt's classes dir is driver-only)
sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/*.jar | head -1)

export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
# worker-forked executor JVMs resolve their classpath via the launcher,
# which scans dev-build directories when this is unset ("Cannot find any
# build directories." against a plain dist)
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER="local-cluster[2,4,4096]"
export SPARK_GRAFT_JARS="file:$(readlink -f "$JAR")"
export SPARK_GRAFT_CPUS=8   # 2 workers x 4 cores

rm -rf "$OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR $*" 2>&1 | tail -3
python3 dev/check.py "$SF_DIR" "$OUT_DIR" "$@"
