#!/bin/bash
# Round-8 measurement sweep (VERDICT r7 #2/#3/#5/#6):
#  - full warm x64 rung (19 r7 families + the 3 new ladder families +
#    adaptive-width q_ann_lsh) — re-measures the r7 dagger rows in their
#    original cache-pressure context, now with the persist guard in place;
#  - new-family rungs (q_tpch_q10, q_cube, q_asof_nearest) at 1x/4x/16x,
#    plus the r7 dagger warm rows (x1 lf_filter_eq_str, x4 window_rank /
#    dedup_clusters) folded into the same invocations;
#  - x64 colds (fresh JVM, runs=1) re-taken in a quiet window;
#  - x4/x16 colds for the two dagger cold families;
#  - StreamOverheadProbe at x4 and x16 (slope-vs-corpus-size check).
# usage: tools/r8_measure.sh [outFile]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r8.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

WARM_QS="q1_agg lf_filter_eq_str lf_filter_extract q_tpch_q5 q_lang_id q_tfidf \
q_dedup_exact q_dedup_minhash q_dedup_ngram q_dedup_clusters q_dedup_simhash \
q_bloom_novel q_hll_distinct q_ann_lsh q_ann_topk_agg q_range_join_keyed \
q_asof_join q_window_rank q_join_star"
NEW_QS="q_tpch_q10 q_cube q_asof_nearest"

declare -A DIRS=([x1]=/root/testdata/sf0.1 [x4]=target/ladder/x4
  [x16]=target/ladder/x16 [x64]=target/ladder/x64)

bench() { # tag dir runs queries...
  local tag="$1" dir="$2" runs="$3"; shift 3
  echo "== $tag dir=$dir runs=$runs $* loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_RUNS="$runs" \
    sbt -batch "runMain graft.Bench $*" 2>&1 \
    | grep -E '\[bench\]|"metric"' >> "$out"
}

# full x64 warm rung first (the big one), incl. new families
bench "warm-x64" "${DIRS[x64]}" 3 $WARM_QS $NEW_QS
# new families down the ladder; dagger warm rows folded in per rung
bench "warm-x1"  "${DIRS[x1]}"  3 $NEW_QS lf_filter_eq_str q_ann_lsh
bench "warm-x4"  "${DIRS[x4]}"  3 $NEW_QS q_window_rank q_dedup_clusters q_ann_lsh
bench "warm-x16" "${DIRS[x16]}" 3 $NEW_QS q_ann_lsh
# x64 colds (fresh JVM each)
for q in q_dedup_minhash q_dedup_ngram lf_dim lf_filter_gt_dbl; do
  bench "cold-x64-$q" "${DIRS[x64]}" 1 "$q"
done
# dagger colds at x4/x16
for r in x4 x16; do
  for q in q_dedup_ngram lf_filter_gt_dbl; do
    bench "cold-$r-$q" "${DIRS[$r]}" 1 "$q"
  done
done
# streaming overhead probe at two corpus sizes
for r in x4 x16; do
  echo "== probe-$r loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.StreamOverheadProbe ${DIRS[$r]} 1 2 4 8" 2>&1 \
    | grep -E '\[probe\]|"metric"' >> "$out"
done
echo DONE >> "$out"
echo "R8_MEASURE_DONE -> $out"
