#!/bin/bash
# Round-17 ladder: x256 rungs for the four r16 heavy shapes the verdict
# flagged as stopping at x64 (q_assoc_rules — post fractional-support
# fix, q_silhouette, q_markov_transitions, q_mix_epochs), plus
# q_weighted_median (re-shaped two-phase this round). x1/x64 legs rerun
# on the SAME code so the x64->x256 step is same-tree, then the x256 leg.
# Corpora from gen_ladder (offsetPast replication); min-of-N, load guard.
# usage: tools/ladder_r17.sh [outFile]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r17.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

QS="q_assoc_rules q_silhouette q_markov_transitions q_mix_epochs q_weighted_median"

declare -A DIRS=([x1]=/root/testdata/sf0.1 [x64]=target/ladder/x64
  [x256]=target/ladder/x256)
declare -A RUNS=([x1]=3 [x64]=3 [x256]=3)

for r in x1 x64 x256; do
  echo "== $r dir=${DIRS[$r]} loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="${DIRS[$r]}" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS="${RUNS[$r]}" SPARK_GRAFT_BENCH_MAXLOAD=2.0 \
  SPARK_GRAFT_BENCH_MINFILE=none \
    sbt -batch "runMain graft.Bench $QS" 2>&1 \
    | grep -E '\[bench\]|"metric"' >> "$out"
done
echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
