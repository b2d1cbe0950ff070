#!/bin/bash
# Round-16 rung: x1/x16/x64 for the TPC-H remainder (Q2/Q11/Q12/Q16/Q20/Q21)
# and the PMI collocations operator. Runs from gen_ladder corpora;
# min-of-N with the load guard.
# usage: tools/ladder_r16.sh [outFile]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r16_ops.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

QS="q_tpch_q2 q_tpch_q11 q_tpch_q12 q_tpch_q16 q_tpch_q20 q_tpch_q21 q_collocations"

declare -A DIRS=([x1]=/root/testdata/sf0.1 [x16]=target/ladder/x16 [x64]=target/ladder/x64)

for r in x1 x16 x64; do
  echo "== $r dir=${DIRS[$r]} loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="${DIRS[$r]}" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MAXLOAD=2.0 \
    sbt -batch "runMain graft.Bench $QS" 2>&1 \
    | grep -E '\[bench\]|"metric"' >> "$out"
done
echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
