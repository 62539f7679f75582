#!/bin/bash
# Direct-JVM runner for graft mains — same flags as build.sbt's forked run,
# without holding the sbt lock (so compiles and measurement runs can overlap).
# Usage: tools/jrun.sh [-cp <classesDir>] <mainClass> [args...]
set -euo pipefail
CLASSES="/root/repo/target/scala-2.13/classes"
if [ "${1:-}" = "-cp" ]; then CLASSES="$2"; shift 2; fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
