#!/bin/bash
# Round-13 second-wave x64 rungs: two-point scale checks for the
# operators added AFTER the r13 ladder ran (TPC-H shapes, boilerplate
# removal, entity matching, interval-overlap join, embedding centroids,
# event throttle dedup, weighted sampling, OOV/Zipf corpus stats).
# x1 / x16 / x64, runs=3, growth = min(x64)/min(x16) — same-day,
# same-host only (r12 host-drift finding).
# usage: tools/ladder_r13b_x64.sh [outFile]  (corpora from tools/gen_ladder.sh)
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r13b_x64.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

QS="q_tpch_q1 q_tpch_q3 q_tpch_q18 q_boilerplate q_entity_match q_interval_overlap q_embed_centroid q_event_dedup_window q_sample_weighted q_oov_rate q_zipf q_triangle q_vocab_prune q_skew_audit"

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
