#!/bin/bash
# r15 optimization round (continuation session) A/B: alternating
# fresh-JVM isolated runs, old arm = worktree at 2d58a3c (pre-change
# tip), new arm = /root/repo working tree. Same protocol as
# tools/bench_attrib.sh / isolate_run.sh; one JSON line per run.
# Usage: tools/r15opt2_ab.sh <out.jsonl> <reps> <sf> <q1> [q2 ...]
set -u
OUT=$1; REPS=$2; SF=$3; shift 3
for rep in $(seq 1 "$REPS"); do
  for q in "$@"; do
    for arm in old new; do
      dir=$([ "$arm" = old ] && echo /tmp/graft_prev || echo /root/repo)
      echo "=== rep$rep $arm $q@$SF ($(date +%H:%M:%S))"
      printf '{"arm":"%s","rep":%s,' "$arm" "$rep" >> "$OUT"
      tools/isolate_run.sh "$dir" "$q@$SF" /tmp/r15opt2_line.json
      # splice the arm tag into the line (isolate_run appends raw)
      tail -1 /tmp/r15opt2_line.json | sed 's/^{//' >> "$OUT"
    done
  done
done
