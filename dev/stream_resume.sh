#!/usr/bin/env bash
# Cross-process streaming restart-resume drill: four SEPARATE JVMs
# (prepare / interrupted / resume / check — see graft.StreamResume).
# The interrupted JVM stops its query mid-input and EXITS; the resume
# JVM must pick up the file-source offset log and state store from the
# checkpoint and drain the rest; the check JVM pins the sink's
# committed contents against the batch twin (set equality = no batch
# replayed, none lost).
#
# Usage: dev/stream_resume.sh [sfDir] [workDir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
WORK="${2:-/tmp/graft_stream_resume}"

rm -rf "$WORK"; mkdir -p "$WORK"
for phase in prepare interrupted resume; do
  echo "== phase: $phase (fresh JVM)"
  sbt -batch "runMain graft.StreamResume $SF_DIR $WORK $phase" 2>&1 \
    | grep -E "^\[resume\]" || true
done
echo "== phase: check (fresh JVM)"
OUT=$(sbt -batch "runMain graft.StreamResume $SF_DIR $WORK check" 2>&1 | grep -E "^\[resume\]" || true)
echo "$OUT"
grep -q "RESUME-EQUALITY OK" <<<"$OUT" && echo "== PASS" || { echo "== FAIL"; exit 1; }
