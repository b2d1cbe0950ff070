#!/bin/bash
# Round-18c ladder: the rows rewritten in the closing r18 session —
# q_bpe_train (incremental byte-id training state), q_corpus_overlap
# (one shingle-keyed exchange), q_text_quality / q_lang_id (textFeatures
# kernel), q_quality_classifier (memoized weight fold) — at x1 (sf0.1)
# and the 64× densified rung. q_bpe_train is the asymptotic claim: the
# old loop re-encoded the corpus under r merges at iteration r (O(k²)
# corpus passes); the incremental state pays O(k). At x1 both are
# job-latency-bound; x64 is where the re-encode term dominates.
# usage: tools/ladder_r18c.sh [outFile]
set -eo pipefail
cd "$(dirname "$0")/.."
out="${1:-target/ladder/results_r18c.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"

QS="q_bpe_train q_corpus_overlap q_text_quality q_lang_id q_quality_classifier"

wait_quiet() {
  while [ "$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)" -ge 2 ]; do
    echo "[ladder] loadavg $(cut -d' ' -f1 /proc/loadavg) >= 2 — waiting 60s" >&2
    sleep 60
  done
}

if [ ! -d target/ladder/x64 ]; then
  wait_quiet
  echo "== regen x64 (wiped by container restart)" >> "$out"
  sbt -batch "runMain graft.ScaleLadder /root/testdata/sf0.1 target/ladder/x64 64" 2>&1 \
    | grep -E 'ladder|replica' | tail -3 >> "$out"
fi

OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
BASE="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -Xms48g -XX:+UseParallelGC"

for rung in /root/testdata/sf0.1 target/ladder/x64; do
  wait_quiet
  echo "== HEAD $rung loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR="$rung" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_MINFILE=none SPARK_GRAFT_BENCH_MAXWAITS=0 \
    java $OPENS $BASE -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench $QS 2>&1 | grep -E '\[bench\]|"metric":"total_compact"' >> "$out"
done

# before-arm at x64 for the asymptotic q_bpe_train claim (r17 worktree
# classes, if the scratch worktree is still compiled)
if [ -d /tmp/r17tree/target/scala-2.13/classes ]; then
  wait_quiet
  echo "== r17 x64 (before-arm) loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR=target/ladder/x64 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_MINFILE=none SPARK_GRAFT_BENCH_MAXWAITS=0 \
    java $OPENS $BASE -cp "/tmp/r17tree/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench $QS 2>&1 | grep -E '\[bench\]|"metric":"total_compact"' >> "$out"
fi

echo "== done loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
echo "LADDER18C_DONE"
