#!/usr/bin/env bash
# Round-17 streaming measurements (r16 verdict #4 and #6):
#
# 1. SECOND RocksDB cap point — same 2M-row/~894k-state workload as
#    dev/stream_r16/run_capped.sh but maxMemoryUsageMB=128: shows the
#    reported ceiling TRACKS the conf (64 -> ~70 observed in r16;
#    128 -> ~13x MB expected), and the new `state_custom_max` field
#    (provider custom metrics, memory/size keys, max over the run)
#    NAMES the overshoot components instead of asserting "~6 MB is
#    tracking outside the bounded budget". Split variant only — the
#    cap behavior is store-level, not variant-level, and r16 measured
#    both variants at 64 MB.
#
# 2. Streaming 4M-row decade — REPLICAS=8000 (x 500-doc probe base),
#    10 micro-batches, split variant: the r16 verify-join redesign's
#    "per-trigger cost scales with the batch, never the corpus" claim
#    gets a second corpus size, giving the streaming tier a fitted
#    slope like the batch tiers. driver.maxResultSize is raised for
#    this point only: the bounded-fan-out broadcast build scales with
#    batch size (the r16 ADVICE #1 caveat, now a documented knob) and
#    a 400k-row micro-batch's build can cross the 1g default while
#    remaining executor-safe.
#
# Both runs carry host_sentinel pre/post pairs per variant; read them
# before reading the walls.
#
# Usage: dev/stream_r17/run_r17.sh
set -euo pipefail
cd "$(dirname "$0")/../.."
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_DRIVER_MEM=48g

OUT="dev/stream_r17/sb_rocksdb_2m_capped128.json"
if [[ ! -s "$OUT" ]]; then
  echo "== stream 2m rocksdb CAPPED 128MB split ($(date +%H:%M:%S))"
  SPARK_GRAFT_STREAM_BATCHES=10 SPARK_GRAFT_STREAM_REPLICAS=4000 \
  SPARK_GRAFT_STREAM_VARIANTS=split \
  SPARK_GRAFT_STATE_STORE=rocksdb \
  SPARK_GRAFT_EXTRA_CONF="spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage=true;spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB=128" \
    sbt -batch "runMain graft.StreamBench" 2>&1 | grep '"variant"' > "$OUT"
  cat "$OUT"
fi

OUT2="dev/stream_r17/sb_rocksdb_4m_split.json"
if [[ ! -s "$OUT2" ]]; then
  echo "== stream 4m rocksdb split ($(date +%H:%M:%S))"
  SPARK_GRAFT_STREAM_BATCHES=10 SPARK_GRAFT_STREAM_REPLICAS=8000 \
  SPARK_GRAFT_STREAM_VARIANTS=split \
  SPARK_GRAFT_STATE_STORE=rocksdb \
  SPARK_GRAFT_EXTRA_CONF="spark.driver.maxResultSize=8g" \
    sbt -batch "runMain graft.StreamBench" 2>&1 | grep '"variant"' > "$OUT2"
  cat "$OUT2"
fi
echo "== done"
