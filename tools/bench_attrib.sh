#!/bin/bash
# Round-11 bench attribution (r10 verdict #1): rerun every >=1.5x
# round-over-round query in a FRESH JVM, at HEAD and at the r9 tip
# (fa4a989, via a git worktree), under identical single-query
# conditions — so "honest-cold accounting / JVM co-tenancy" separates
# from "real code regression". Each run is one sbt JVM: cold pass +
# min-of-3 warm (the bench's own protocol), nothing else sharing the
# machine.
#
# Usage: tools/bench_attrib.sh <r9_worktree_dir> <out_dir>
set -u
R9=${1:-/tmp/graft_r9}
OUT=${2:-/root/repo/target/attrib}
mkdir -p "$OUT"

QUERIES="mm_frame_overlap la_bh_fdr la_cuped ts_theil_sen ts_chow_test dd_threshold_curve dd_threshold_curve_capped sim_ivf_probe_curve dd_minhash_recall"

run() { # dir tag query sf1dir
  local dir=$1 tag=$2 q=$3 sf1=$4
  local f="$OUT/${tag}_${q}.json"
  [ -s "$f" ] && { echo "skip $tag $q (exists)"; return; }
  echo "=== $tag $q ($(date +%H:%M:%S))"
  (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
     SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_SF1_DIR=$sf1 \
     sbt -batch "runMain graft.Bench" 2>"$OUT/${tag}_${q}.err" \
     | grep -o '{"metric".*' > "$f")
  tail -c 400 "$f"; echo
}

for q in $QUERIES; do
  run /root/repo head "$q" /nonexistent
  run "$R9"     r9   "$q" /nonexistent
done

# g_pagerank: the sf1 row is the flagged one. A lineitem-only sf1 dir
# keeps the r9 side (whose sf1 sweep has no BENCH_ONLY filter) to the
# graph subset instead of the full 20-minute sweep.
SF1LI=/tmp/sf1_lineitem
mkdir -p "$SF1LI"
ln -sf /root/repo/target/sf1/lineitem.parquet "$SF1LI/lineitem.parquet"
run /root/repo head g_pagerank "$SF1LI"
run "$R9"     r9   g_pagerank "$SF1LI"

echo "ATTRIB DONE $(date +%H:%M:%S)"
