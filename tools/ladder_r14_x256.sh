#!/bin/bash
# Round-14 ladder: (a) x256 rungs for the three near-linear families the
# r13 verdict flagged (q_embed_centroid 3.8x, q_chunk_cdc 3.2x, q_tpch_q4
# 3.3x at the x16->x64 step) plus q_tpch_q1 (item 7: 3.4x, explain pass);
# (b) x1/x16/x64 two-point rungs for the operators added in round 14
# (image dHash dedup, audio fingerprint dedup, hybrid RRF, OLS, mutual
# information, streaming merge/outer-join are spec-covered not laddered).
# runs from gen_ladder corpora; min-of-N with the load guard.
# usage: tools/ladder_r14_x256.sh [outFile]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r14.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

X256_QS="q_embed_centroid q_chunk_cdc q_tpch_q4 q_tpch_q1"
# q_tpch_q6 rides along as the scan-bound CONTRAST row for the q_tpch_q1
# saturation analysis (double sums vs q1's five decimal aggregates)
R14_QS="q_tpch_q6 q_mm_dedup_image q_mm_dedup_audio q_hybrid_rrf q_linreg q_mutual_info q_mad_outliers q_dp_release q_retrieval_eval"

declare -A DIRS=([x1]=/root/testdata/sf0.1 [x16]=target/ladder/x16
  [x64]=target/ladder/x64 [x256]=target/ladder/x256)

for r in x1 x16 x64; do
  echo "== $r dir=${DIRS[$r]} loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="${DIRS[$r]}" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MAXLOAD=2.0 \
    sbt -batch "runMain graft.Bench $X256_QS $R14_QS" 2>&1 \
    | grep -E '\[bench\]|"metric"' >> "$out"
done
# x256: the four flagged families only (corpus is 256x sf0.1; runs=5 for
# the verdict's "load-gated min-of-5" ask)
echo "== x256 dir=${DIRS[x256]} loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
SPARK_GRAFT_SF_DIR="${DIRS[x256]}" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_RUNS=5 SPARK_GRAFT_BENCH_MAXLOAD=2.0 \
  sbt -batch "runMain graft.Bench $X256_QS" 2>&1 \
  | grep -E '\[bench\]|"metric"' >> "$out"
echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
