#!/usr/bin/env bash
# Round-14 growth-exponent experiment: SOLO focused graft.Bench runs of
# the worst-growth set at 1x / 10x / 100x (uniform + skew), one JVM per
# scale (the r13 protocol — solo numbers include the subset's artifact
# builds, so growth factors compare like-for-like). spark-submit with
# the `sbt package` jar, so runs don't contend with sbt; heap sized for
# the 100x replicas.
#
# Usage: dev/scale_experiment_r14/run_spark.sh <tag> <sfDir>
#   tag in {1x, 10x_uniform, 10x_skew, 100x_uniform, 100x_skew}
set -euo pipefail
cd "$(dirname "$0")/../.."
TAG="$1"; DIR="$2"
QUERIES="q38_salted_join t06_minhash_lsh_pairs t08_ngram_jaccard_pairs t41_graph_pagerank t76_exact_probe_neardup"
OUT="dev/scale_experiment_r14/spark_grow5_${TAG}.json"
if [[ -s "$OUT" ]]; then echo "== $OUT exists, skipping"; exit 0; fi
JAR=$(ls target/scala-2.13/tingdataetlspark_*.jar | head -1)
echo "== spark grow5 $TAG ($DIR)"
# maxResultSize lifted for the 100x replicas: verifyJaccard's corpus
# side sits under the 64MB COMPRESSED broadcast threshold while its
# serialized rows are ~1.1GB — in local mode that broadcast lands on
# the driver's result limit. A stats artifact of the twilight zone
# (compressed < threshold < serialized), not a plan defect: at real
# 100 TB the stats exceed the threshold and the join shuffles.
SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_BENCH_OUT="$OUT" \
  /opt/spark/bin/spark-submit --class graft.Bench --master 'local[32]' \
    --driver-memory "${GROW5_MEM:-48g}" \
    --conf spark.ui.enabled=false \
    --conf spark.driver.maxResultSize=8g \
    "$JAR" $QUERIES 2>&1 | grep -E '^\[bench\]|"metric"' | tail -3
echo "== wrote $OUT"
