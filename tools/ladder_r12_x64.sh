#!/bin/bash
# Round-12 x64 rungs for the streaming + LSH families (r11 verdict #5):
# q_stream_join / q_stream_tumbling / q_dedup_embed_lsh / q_ann_lsh at
# x1 / x16 / x64, measured SAME-DAY on one host (the round-12 host-drift
# finding makes cross-day growth factors meaningless). runs=3 at every
# rung; growth factor = min(x64)/min(x16).
# usage: tools/ladder_r12_x64.sh [outFile]  (corpora from tools/gen_ladder.sh)
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r12_x64.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

QS="q_stream_join q_stream_tumbling q_dedup_embed_lsh q_ann_lsh"

declare -A DIRS=([x1]=/root/testdata/sf0.1 [x16]=target/ladder/x16
  [x64]=target/ladder/x64)

for r in x1 x16 x64; do
  echo "== $r dir=${DIRS[$r]} loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="${DIRS[$r]}" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MAXLOAD=2.0 \
    sbt -batch "runMain graft.Bench $QS" 2>&1 \
    | grep -E '\[bench\]|"metric"' >> "$out"
done
echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
