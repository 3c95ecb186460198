#!/bin/bash
# Full-fidelity graft.Bench launcher — mirrors build.sbt's javaOptions
# (JDK-17 add-opens, UTC, 16g) so direct-java runs match sbt runs.
# Usage: tools/bench.sh <sfdir> [query ...]
SF="${1:-/root/testdata/sf0.1}"; shift || true
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
# SPARK_GRAFT_EXTRA_OPTS: optional extra -D flags (r17 — e.g.
# -Dspark.cleaner.periodicGC.interval=60s for the sf100 BFS family,
# whose store-build shuffle files otherwise hold the disk until the
# default 30-min periodic GC, long past a 5-minute job)
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${SPARK_GRAFT_EXTRA_OPTS:-} \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench "$@"
