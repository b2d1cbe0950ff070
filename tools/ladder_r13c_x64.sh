#!/bin/bash
# Round-13 third-wave x64 rungs: two-point scale checks for the
# operators added after ladder_r13b ran (TPC-H Q4/Q7/Q13/Q14/Q15/Q17/Q22,
# Misra-Gries heavy hitters, incremental join-view maintenance, KS drift,
# l-diversity, product-quantization ANN, content-defined chunking).
# x1 / x16 / x64, runs=3, growth = min(x64)/min(x16) — same-day,
# same-host only (r12 host-drift finding).
# usage: tools/ladder_r13c_x64.sh [outFile]  (corpora from tools/gen_ladder.sh)
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r13c_x64.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

QS="q_tpch_q4 q_tpch_q7 q_tpch_q13 q_tpch_q14 q_tpch_q15 q_tpch_q17 q_tpch_q22 q_heavy_hitters q_ivm_join q_ks_drift q_l_diversity q_ann_pq q_chunk_cdc"

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
