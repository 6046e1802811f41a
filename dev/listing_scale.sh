#!/usr/bin/env bash
# Listing-at-scale experiment: build the 1e5-file tree (once) and time
# HeaderScan's listing paths over it. Needs `sbt package` first (the
# graft classes ride --jars into spark-shell).
# Usage: dev/listing_scale.sh [nFiles] [treeDir]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-100000}"
TREE="${2:-/tmp/listing_tree}"
JAR=$(ls target/scala-2.13/*.jar | head -1)
if [[ ! -d "$TREE" ]]; then
  python3 dev/mk_listing_tree.py "$TREE" "$N"
fi
LISTING_TREE="$TREE" /opt/spark/bin/spark-shell --master 'local[32]' \
  --jars "$JAR" -i dev/listing_scale.scala 2>/dev/null | grep '^\[listing\]'
