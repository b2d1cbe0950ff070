#!/bin/bash
# Round-15 second leg: x1/x16/x64 rungs for the operators added in the
# r15 continuation session — NFC normalization, Holt-Winters, perceptron
# training, kNN graph + mutual-kNN clusters, full-outer join, Theil-Sen.
# Runs from gen_ladder corpora; min-of-N with the load guard.
# usage: tools/ladder_r15b.sh [outFile]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r15b_ops.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

QS="q_normalize_unicode q_ts_holt_winters q_perceptron_train q_knn_graph q_knn_clusters q_join_full q_theil_sen"

declare -A DIRS=([x1]=/root/testdata/sf0.1 [x16]=target/ladder/x16 [x64]=target/ladder/x64)

for r in x1 x16 x64; do
  echo "== $r dir=${DIRS[$r]} loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="${DIRS[$r]}" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MAXLOAD=2.0 \
    sbt -batch "runMain graft.Bench $QS" 2>&1 \
    | grep -E '\[bench\]|"metric"' >> "$out"
done
echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
