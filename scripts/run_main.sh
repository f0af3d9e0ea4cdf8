#!/usr/bin/env bash
# Run a graft main directly on the compiled classes — no sbt lock, so a
# long ScaleUp/Bench can overlap an sbt compile/test. Mirrors build.sbt's
# forked-JVM flags (JDK17 add-opens, UTC, SPARK_DRIVER_MEM heap).
# Usage: scripts/run_main.sh graft.Bench [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-16g}" -cp "$CP" "$@"
