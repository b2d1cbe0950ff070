#!/bin/bash
# Round-8 quiet re-measure after the co-partitioned join redesign: the lf
# parity rows at every rung (their plan changed), the three new ladder
# families, and adaptive-width q_ann_lsh. runs=5 at x1-x16 so min reaches
# the JIT-warm floor; x64 runs=3.
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r8_quiet.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"
QS="lf_filter_eq_str lf_filter_extract q_ann_lsh q_tpch_q10 q_cube q_asof_nearest"
declare -A DIRS=([x1]=/root/testdata/sf0.1 [x4]=target/ladder/x4
  [x16]=target/ladder/x16 [x64]=target/ladder/x64)
declare -A RUNS=([x1]=5 [x4]=5 [x16]=5 [x64]=3)
bench() {
  local tag="$1" dir="$2" runs="$3"; shift 3
  echo "== $tag dir=$dir runs=$runs $* loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_RUNS="$runs" \
    sbt -batch "runMain graft.Bench $*" 2>&1 \
    | grep -E '\[bench\]|"metric"' >> "$out"
}
for r in x1 x4 x16 x64; do
  bench "quiet-$r" "${DIRS[$r]}" "${RUNS[$r]}" $QS
done
# cold lf_dim at x16/x64 with the new build shape (one extra exchange)
for r in x16 x64; do
  bench "cold-$r-lf_dim" "${DIRS[$r]}" 1 lf_dim
done
echo DONE >> "$out"
echo "R8_REQUIET_DONE -> $out"
