#!/bin/bash
# Round-13 x64 rungs for the queries NEW this round (two-point scale
# checks, same-day same-host — the r12 host-drift finding makes
# cross-day growth factors meaningless): BPE tokenize family rep, CDC
# apply, span decontamination, IVM merge, DSIR selection, RP-ANN,
# time-series resample. x1 / x16 / x64, runs=3, growth = min(x64)/min(x16).
# usage: tools/ladder_r13_x64.sh [outFile]  (corpora from tools/gen_ladder.sh)
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r13_x64.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

QS="q_tokenize_bpe q_cdc_apply q_decontaminate q_ivm_agg q_dsir_weights q_dsir_sample q_ann_rp q_ts_resample"

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
