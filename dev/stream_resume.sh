#!/usr/bin/env bash
# Cross-process streaming restart-resume drill: four SEPARATE JVMs
# (prepare / interrupted / resume / check — see graft.StreamResume).
# The interrupted JVM stops its query mid-input and EXITS; the resume
# JVM must pick up the file-source offset log and state store from the
# checkpoint and drain the rest; the check JVM pins the sink's
# committed contents against the batch twin (set equality = no batch
# replayed, none lost).
#
# SPARK_GRAFT_STATE_STORE=rocksdb runs the same drill on the RocksDB
# state store (the 100 TB state configuration) — cross-process state
# reload is exactly where the providers differ.
#
# Usage: dev/stream_resume.sh [sfDir] [workDir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
WORK="${2:-/tmp/graft_stream_resume}"

rm -rf "$WORK"; mkdir -p "$WORK"
for phase in prepare interrupted resume; do
  echo "== phase: $phase (fresh JVM)"
  # capture the phase's real exit status: `| grep || true` would swallow
  # an sbt/JVM crash, and a crashed 'interrupted' phase that never starts
  # its query makes 'resume' drain everything from scratch — the drill
  # would print PASS without exercising cross-process resume at all
  PHASE_OUT=$(sbt -batch "runMain graft.StreamResume $SF_DIR $WORK $phase" 2>&1) \
    || { echo "== FAIL: phase $phase exited non-zero"; \
         grep -E "^\[resume\]|error|Exception" <<<"$PHASE_OUT" | tail -20; exit 1; }
  grep -E "^\[resume\]" <<<"$PHASE_OUT" || true
  if [[ "$phase" == interrupted ]]; then
    N=$(grep -oE "interrupted after [0-9]+" <<<"$PHASE_OUT" | grep -oE "[0-9]+" || echo 0)
    if [[ "${N:-0}" -lt 1 ]]; then
      echo "== FAIL: interrupted phase committed no batches (N=$N) — resume would start from scratch"
      exit 1
    fi
  fi
done
echo "== phase: check (fresh JVM)"
CHECK_OUT=$(sbt -batch "runMain graft.StreamResume $SF_DIR $WORK check" 2>&1) \
  || { echo "== FAIL: check phase exited non-zero"; \
       grep -E "^\[resume\]|error|Exception" <<<"$CHECK_OUT" | tail -20; exit 1; }
OUT=$(grep -E "^\[resume\]" <<<"$CHECK_OUT" || true)
echo "$OUT"
grep -q "RESUME-EQUALITY OK" <<<"$OUT" && echo "== PASS" || { echo "== FAIL"; exit 1; }
