#!/usr/bin/env bash
# Round-15 third streaming-state point: ~2M probe rows / ~900k max
# state rows (100x the r14 default, 10x its big point; REPLICAS x 500-doc probe base = rows) on BOTH state stores, same
# workload, same box, one sitting — extends the r14 two-point
# heap-growth comparison (HDFS on-heap map: linear; RocksDB: flat
# memtable floor) to three points spanning two decades.
#
# 2M rows of shingle arrays ride the driver (MemoryStream batches are
# driver-fabricated), so the forked JVM gets a 48g heap via the
# build.sbt SPARK_DRIVER_MEM seam. Never run concurrently with a
# timed bench.
#
# Usage: dev/stream_r15/run_2m.sh
set -euo pipefail
cd "$(dirname "$0")/../.."
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_STREAM_BATCHES=10
export SPARK_GRAFT_STREAM_REPLICAS=4000
export SPARK_DRIVER_MEM=48g
for store in hdfs rocksdb; do
  OUT="dev/stream_r15/sb_${store}_2m.json"
  if [[ -s "$OUT" ]]; then echo "== $OUT exists, skipping"; continue; fi
  echo "== stream 2m $store ($(date +%H:%M:%S))"
  SPARK_GRAFT_STATE_STORE="$store" \
    sbt -batch "runMain graft.StreamBench" 2>&1 | grep '"variant"' > "$OUT"
  cat "$OUT"
done
echo "== done"
