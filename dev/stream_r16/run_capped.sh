#!/usr/bin/env bash
# Round-16 judge ask #3: demonstrate the RocksDB memory CEILING — the
# one conf the r15 100 TB state argument claimed but never exercised.
# Same 2M-row/~894k-state-row workload as dev/stream_r15/run_2m.sh
# (REPLICAS=4000 x 500-doc probe base, 10 micro-batches), RocksDB
# store, but with bounded memory usage ON and a deliberately small
# 64 MB cap — r15 measured 183 MB uncapped at this scale, so the cap
# genuinely binds (~3x under the working set). Publishes state_mem_mb
# under the cap and the throughput cost vs the uncapped r15 run.
#
# Also re-runs the one unexplained number in the r15 table: the
# rocksdb-exact 200k control (212 s vs hdfs's 99 s in r15's window) —
# once, uncapped, to see whether it reproduces or was window noise.
#
# Usage: dev/stream_r16/run_capped.sh
set -euo pipefail
cd "$(dirname "$0")/../.."
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_DRIVER_MEM=48g

OUT="dev/stream_r16/sb_rocksdb_2m_capped.json"
if [[ ! -s "$OUT" ]]; then
  echo "== stream 2m rocksdb CAPPED 64MB ($(date +%H:%M:%S))"
  SPARK_GRAFT_STREAM_BATCHES=10 SPARK_GRAFT_STREAM_REPLICAS=4000 \
  SPARK_GRAFT_STATE_STORE=rocksdb \
  SPARK_GRAFT_EXTRA_CONF="spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage=true;spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB=64" \
    sbt -batch "runMain graft.StreamBench" 2>&1 | grep '"variant"' > "$OUT"
  cat "$OUT"
fi

OUT2="dev/stream_r16/sb_rocksdb_200k_recheck.json"
if [[ ! -s "$OUT2" ]]; then
  echo "== stream 200k rocksdb recheck ($(date +%H:%M:%S))"
  SPARK_GRAFT_STREAM_BATCHES=10 SPARK_GRAFT_STREAM_REPLICAS=400 \
  SPARK_GRAFT_STATE_STORE=rocksdb \
    sbt -batch "runMain graft.StreamBench" 2>&1 | grep '"variant"' > "$OUT2"
  cat "$OUT2"
fi

OUT3="dev/stream_r16/sb_hdfs_200k_recheck.json"
if [[ ! -s "$OUT3" ]]; then
  echo "== stream 200k hdfs same-window control ($(date +%H:%M:%S))"
  SPARK_GRAFT_STREAM_BATCHES=10 SPARK_GRAFT_STREAM_REPLICAS=400 \
  SPARK_GRAFT_STATE_STORE=hdfs \
    sbt -batch "runMain graft.StreamBench" 2>&1 | grep '"variant"' > "$OUT3"
  cat "$OUT3"
fi
echo "== done"
