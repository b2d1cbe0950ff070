#!/bin/bash
# Round-18 JVM-profile A/B for the unattributed r17 bench inflation
# (VERDICT r17 #1): the five heavy rows that inflated 2-9x vs their r16
# minima on UNCHANGED code, re-run solo in fresh JVMs under three JVM
# profiles, so the one code-side suspect (the r17 -Xms48g pin +
# ParallelGC, build.sbt) is either convicted or cleared:
#   head  = -Xmx48g -Xms48g -XX:+UseParallelGC   (r17 official profile)
#   r16   = -Xmx48g                               (G1, adaptive heap — r16 profile)
#   pgc   = -Xmx48g -XX:+UseParallelGC            (isolates -Xms from the collector)
# Direct `java` (not sbt fork) so the flags are exactly what we say they
# are. Fresh JVM per profile; min-of-N absorbs JIT warm-up (runs=6).
# usage: tools/ab_jvm_r18.sh [outFile] [queries...]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ab_jvm_r18.txt}"
shift 2>/dev/null || true
QS="${*:-q_range_join q_join_salted_forced q_rep_signals q_bpe_pair_stats q_quality_classifier q_tpch_q1 q1_agg}"
mkdir -p "$(dirname "$out")"

CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
BASE="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

declare -A FLAGS=(
  [head]="-Xmx48g -Xms48g -XX:+UseParallelGC"
  [r16]="-Xmx48g"
  [pgc]="-Xmx48g -XX:+UseParallelGC"
)

for prof in head r16 pgc; do
  # refuse to measure on a loaded host — same discipline as Bench's gate
  while [ "$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)" -ge 2 ]; do
    echo "[ab] loadavg $(cut -d' ' -f1 /proc/loadavg) >= 2 — waiting 60s" >&2
    sleep 60
  done
  echo "== profile=$prof flags='${FLAGS[$prof]}' loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS="${SPARK_GRAFT_BENCH_RUNS:-6}" \
  SPARK_GRAFT_BENCH_MINFILE=none SPARK_GRAFT_BENCH_MAXWAITS=0 \
    java $OPENS $BASE ${FLAGS[$prof]} -cp "$CP" graft.Bench $QS 2>&1 \
    | grep -E '\[bench\]|"metric"' >> "$out"
done
echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
echo "AB_DONE"
