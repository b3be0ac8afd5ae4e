#!/bin/bash
# Worktree-interleaved A/B (the r11 §1b wave protocol): run the same
# bench.py subset alternately from the base worktree and HEAD so both
# arms sample the same external-load state.  Usage:
#   tools/ab_interleave.sh <pairs> <out_prefix> q306_... q334_...
set -u
PAIRS=$1; shift
OUT=$1; shift
QS="$*"
BASE=${AB_BASE:-/tmp/r12_base}
for i in $(seq 1 "$PAIRS"); do
  echo "== pair $i base ==" >> "${OUT}_base.log"
  (cd "$BASE" && SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
     python bench.py $QS 2>> "${OUT}_base.log" >> "${OUT}_base.json")
  echo "== pair $i head ==" >> "${OUT}_head.log"
  (cd /root/repo && SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
     python bench.py $QS 2>> "${OUT}_head.log" >> "${OUT}_head.json")
done
echo done
