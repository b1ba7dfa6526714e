#!/bin/bash
# r15 (r14 verdict #1): one-time isolated-ledger backfill — a fresh
# single-query JVM for EVERY headline row above the suspect floor
# (sf0.1 warm >= 0.2 s, sf1 warm >= 1.0 s in the r14 artifact) that
# lacks a round-14-stamped ledger entry, so future sweeps can
# adjudicate suspects from the ledger even in rounds that touch
# wide-ownership files (r14 shipped 11 needs-attribution rows for
# exactly this gap). Run at a CLEAN tip before any round code lands —
# provenance is then provable by git alone.
# Usage: tools/ledger_backfill.sh <rows_file> <out_jsonl>
set -u
ROWS=$1; OUT=$2
case "$OUT" in /*) ;; *) OUT="$PWD/$OUT";; esac
n=0; total=$(wc -l < "$ROWS")
while read -r spec; do
  [ -z "$spec" ] && continue
  n=$((n+1))
  # resumable: a row already in OUT (by name+sf) is skipped, so an
  # interrupted sweep restarts where it stopped
  name=${spec%@*}; sf=${spec#*@}
  if [ -f "$OUT" ] && grep -q "\"isolated\":\"$name\",\"sf\":\"$sf\"" "$OUT"; then
    echo "[$n/$total] $spec skip (done)" >&2; continue
  fi
  echo "[$n/$total] $spec $(date +%H:%M:%S)" >&2
  tools/isolate_run.sh /root/repo "$spec" "$OUT"
done < "$ROWS"
echo "BACKFILL DONE $(date +%H:%M:%S)" >&2
