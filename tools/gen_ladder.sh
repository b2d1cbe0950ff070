#!/bin/bash
# Regenerate the scale-ladder corpora (SCALE.md) with the offsetPast
# generator (ScaleLadder.scala). Usage:
#   tools/gen_ladder.sh [baseSfDir] [factor...]
# Defaults: baseSfDir = /root/testdata/sf0.1, factors = 4 16 64.
# All rungs run in ONE sbt invocation (one JVM warm-up, not one per rung).
set -eo pipefail
cd "$(dirname "$0")/.."
base="${1:-/root/testdata/sf0.1}"
shift 2>/dev/null || true
factors=("$@")
[ ${#factors[@]} -eq 0 ] && factors=(4 16 64)
cmds=()
for r in "${factors[@]}"; do
  rm -rf "target/ladder/x$r"
  cmds+=("runMain graft.ScaleLadder $base target/ladder/x$r $r")
done
sbt -batch "${cmds[@]}"
echo "LADDER_DONE ${factors[*]}"
