#!/bin/bash
# Scale-ladder measurement sweep (SCALE.md): warm rows (runs=3, reporting
# min and median), by-contract-quadratic rows (capped at 16x), cold rows
# (fresh JVM, runs=1, single query), and the cold JIT-vs-scan split
# (q_chunk first warms kernel JIT in the same JVM, so the following
# q_dedup_minhash cold cost is scan-dominated — the delta vs the solo cold
# row is the classload/JIT share).
# usage: tools/ladder_bench.sh [outFile]  (corpora from tools/gen_ladder.sh)
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r7.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

WARM_QS="q1_agg lf_filter_eq_str lf_filter_extract q_tpch_q5 q_lang_id q_tfidf \
q_dedup_exact q_dedup_minhash q_dedup_ngram q_dedup_clusters q_dedup_simhash \
q_bloom_novel q_hll_distinct q_ann_lsh q_ann_topk_agg q_range_join_keyed \
q_asof_join q_window_rank q_join_star"
QUAD_QS="q_range_join q_dedup_embed" # by-contract quadratic: never run at 64x

declare -A DIRS=([x1]=/root/testdata/sf0.1 [x4]=target/ladder/x4
  [x16]=target/ladder/x16 [x64]=target/ladder/x64)

bench() { # tag dir runs queries...
  local tag="$1" dir="$2" runs="$3"; shift 3
  echo "== $tag dir=$dir runs=$runs $*" >> "$out"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_RUNS="$runs" \
    sbt -batch "runMain graft.Bench $*" 2>&1 \
    | grep -E '\[bench\]|"metric"' >> "$out"
}

for r in x1 x4 x16 x64; do
  bench "warm-$r" "${DIRS[$r]}" 3 $WARM_QS
done
for r in x1 x4 x16; do
  bench "quad-$r" "${DIRS[$r]}" 2 $QUAD_QS
done
for r in x1 x4 x16 x64; do
  for q in q_dedup_minhash q_dedup_ngram lf_dim lf_filter_gt_dbl; do
    bench "cold-$r-$q" "${DIRS[$r]}" 1 "$q"
  done
done
for r in x1 x16; do
  bench "split-$r" "${DIRS[$r]}" 1 q_chunk q_dedup_minhash
done
echo DONE >> "$out"
echo "LADDER_BENCH_DONE -> $out"
