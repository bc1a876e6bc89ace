#!/usr/bin/env bash
# Run a graft main class directly (faster than sbt runMain, env-controllable).
# Usage: tools/run.sh graft.Bench [args...]   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
ADD_OPENS="$ADD_OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens java.base/sun.security.action=ALL-UNNAMED \
 --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:ParallelGCThreads=8 -XX:ConcGCThreads=2 -XX:ReservedCodeCacheSize=512m \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
