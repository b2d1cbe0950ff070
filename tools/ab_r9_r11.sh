#!/bin/bash
# Round-12 A/B: attribute the uniform ~2.3x bench inflation between
# BENCH_r09 (total 33.0 s) and BENCH_r11 (75.9 s) to host drift vs engine
# regression (VERDICT r11 item #1). Runs the SAME arg-restricted query
# subset against the r11 tree (repo HEAD) and the r9 snapshot tree
# (worktree at b326075) interleaved A/B/A/B on one host, min-of-3, same
# heap (-Xmx48g pinned in both build.sbt files), same CPUS=32.
# Arg-restricted runs skip the named warmups in BOTH trees, so first-touch
# costs (lf row-id index) land on lf_dim (alphabetically first) in both.
# usage: tools/ab_r9_r11.sh [outFile]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ab/results_r12.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

QS="lf_dim q1_agg q_cube q_window_rank q_tpch_q5 lf_filter_extract \
lf_filter_eq_str q_join_star q_tfidf q_hll_distinct"

bench() { # tag dir
  local tag="$1" dir="$2"
  echo "== $tag loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  ( cd "$dir" && \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MAXLOAD=2.0 \
    sbt -batch "runMain graft.Bench $QS" 2>&1 ) \
    | grep -E '\[bench\]|"metric"' >> "$out"
}

bench r11-a /root/repo
bench r9-a  /root/repo/target/ab-r9
bench r11-b /root/repo
bench r9-b  /root/repo/target/ab-r9
echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
