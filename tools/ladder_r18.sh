#!/bin/bash
# Round-18 ladder work:
#  (a) VERDICT r17 #4 — certify the fractional assoc-support floor on an
#      enumeration-ACTIVE corpus: SkewCatalog derives Zipf-hot lineitem
#      variants of sf0.1 (x1) and the x64 ladder rung, then q_assoc_rules
#      runs on both. The support-profile JSON each generation prints is
#      the proof the frequent set is non-empty at both rungs.
#  (b) VERDICT r17 #8 — quiet x256 retakes for the two rows whose r17
#      x256 legs ran at loadavg 14-17: q_silhouette (90 s/5.9 s bimodal),
#      q_markov_transitions (minima inverted across legs).
# usage: tools/ladder_r18.sh [outFile]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r18.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

wait_quiet() {
  while [ "$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)" -ge 2 ]; do
    echo "[ladder] loadavg $(cut -d' ' -f1 /proc/loadavg) >= 2 — waiting 60s" >&2
    sleep 60
  done
}

# (a) skew corpora + assoc rungs
wait_quiet
echo "== gen x1skew/x64skew (hotFrac=0.3 hotItems=30)" >> "$out"
rm -rf target/ladder/x1skew target/ladder/x64skew
sbt -batch \
  "runMain graft.SkewCatalog /root/testdata/sf0.1 target/ladder/x1skew" \
  "runMain graft.SkewCatalog target/ladder/x64 target/ladder/x64skew" 2>&1 \
  | grep -E '"skewed"' >> "$out"

for rung in x1skew x64skew; do
  wait_quiet
  echo "== $rung loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="target/ladder/$rung" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MINFILE=none \
    sbt -batch "runMain graft.Bench q_assoc_rules" 2>&1 \
    | grep -E '\[bench\]|"metric":"total_compact"' >> "$out"
done

# (b) quiet x256 retakes
wait_quiet
echo "== x256 retake loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
SPARK_GRAFT_SF_DIR=target/ladder/x256 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MINFILE=none \
  sbt -batch "runMain graft.Bench q_silhouette q_markov_transitions" 2>&1 \
  | grep -E '\[bench\]|"metric":"total_compact"' >> "$out"

echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
echo "LADDER18_DONE"
