#!/bin/bash
# Resume-only runner for the x256 leg of tools/ladder_r14_x256.sh (the
# original run's x1/x16/x64 legs completed; the x256 leg was cut short).
# Appends to the same results file. q_tpch_q6 rides along as the
# scan-bound contrast row for the q_tpch_q1 saturation analysis.
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r14.txt}"
X256_QS="q_embed_centroid q_chunk_cdc q_tpch_q4 q_tpch_q1 q_tpch_q6"
echo "== x256(resume) dir=target/ladder/x256 loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
SPARK_GRAFT_SF_DIR=target/ladder/x256 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_RUNS=5 SPARK_GRAFT_BENCH_MAXLOAD=2.0 \
  sbt -batch "runMain graft.Bench $X256_QS" 2>&1 \
  | grep -E '\[bench\]|"metric"' >> "$out"
echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
# (appended) quiet retake of the three contention-flagged r14 rows
