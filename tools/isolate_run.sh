#!/bin/bash
# Fresh-JVM single-query isolation without sbt startup overhead:
# java -cp <classes>:/opt/spark/jars/* graft.Bench with the same JVM
# flags build.sbt gives forked runs (add-opens + 8g + UTC + no UI).
# Usage: tools/isolate_run.sh <repo_dir> <name@sf0.1|name@sf1> [out_file]
# Prints/append the one JSON line the SPARK_GRAFT_ISOLATE protocol emits.
set -u
DIR=$1; SPEC=$2; OUT=${3:-/dev/stdout}
# resolve OUT before the cd below so a relative path lands where the
# CALLER stands, not inside a worktree's own target/ (r15 first-run bug)
case "$OUT" in /*) ;; *) OUT="$PWD/$OUT";; esac
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd "$DIR" || exit 1
SPARK_GRAFT_ISOLATE="$SPEC" java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  2>/dev/null | grep -o '{"isolated".*' >> "$OUT"
