#!/usr/bin/env bash
# Streaming-throughput datum for the t77/t78 streaming halves (SCALE.md
# "Streaming" section): rows/sec, per-batch wall, max state-store rows,
# watermark lag, on MemoryStream micro-batches at sf scale.
#
# Usage: dev/stream_bench.sh [sfDir]
set -euo pipefail
cd "$(dirname "$0")/.."
export SPARK_GRAFT_SF_DIR="${1:-/root/testdata/sf0.1}"
export SPARK_GRAFT_STREAM_BATCHES="${SPARK_GRAFT_STREAM_BATCHES:-10}"
export SPARK_GRAFT_STREAM_REPLICAS="${SPARK_GRAFT_STREAM_REPLICAS:-4}"
sbt -batch "runMain graft.StreamBench" 2>&1 | grep '"variant"'
