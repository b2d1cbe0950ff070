#!/bin/bash
# Round-18b ladder: q_range_join after the eager-aggregation rewrite
# (SCALE.md r18b). The x64 rung densifies the SAME date axis 64×
# (ScaleLadder offsets orderkeys, not dates), which is exactly the regime
# where the old raw-point shape grew its candidate set quadratically
# (points×intervals both 64×); the rollup shape's joined frame stays
# |distinct days| on the point side, so growth is driven by the interval
# side alone (64× intervals → ~linear work). Compare against the r12-era
# x16 readings of the old shape recorded in tools/results_r8*.txt and
# SCALE.md rounds 11-13.
# usage: tools/ladder_r18b.sh [outFile]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r18b.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

wait_quiet() {
  while [ "$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)" -ge 2 ]; do
    echo "[ladder] loadavg $(cut -d' ' -f1 /proc/loadavg) >= 2 — waiting 60s" >&2
    sleep 60
  done
}

# regenerate the x64 rung if the container restart wiped it
if [ ! -d target/ladder/x64 ]; then
  wait_quiet
  echo "== regen x64 (wiped by container restart)" >> "$out"
  sbt -batch "runMain graft.ScaleLadder /root/testdata/sf0.1 target/ladder/x64 64" 2>&1 \
    | grep -E 'ladder|replica' | tail -3 >> "$out"
fi

for rung in /root/testdata/sf0.1 target/ladder/x64; do
  wait_quiet
  echo "== $rung loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="$rung" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MINFILE=none \
    sbt -batch "runMain graft.Bench q_range_join q_range_join_keyed q_interval_overlap" 2>&1 \
    | grep -E '\[bench\]|"metric":"total_compact"' >> "$out"
done

echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
echo "LADDER18B_DONE"
