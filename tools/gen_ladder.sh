#!/bin/bash
# Regenerate the scale-ladder corpora with the fixed offsetPast generator.
set -e
cd /root/repo
for r in 4 16 64; do
  rm -rf target/ladder/x$r
  sbt -batch "runMain graft.ScaleLadder /root/testdata/sf0.1 target/ladder/x$r $r" 2>&1 | tail -2
done
echo LADDER_DONE
