#!/bin/bash
# Run graft.Bench via plain java against already-compiled classes, so a
# long scaling probe doesn't hold the sbt project lock while the build
# loop keeps compiling. Mirrors build.sbt's javaOptions (JDK17 add-opens,
# UTC, no UI). Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_BENCH_ONLY=... \
#   tools/bench_java.sh
set -e
cd /root/repo
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
         sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_CLASSES overrides the classpath root — point it at a snapshot
# copy so a long probe never races the build loop's recompiles.
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "${GRAFT_CLASSES:-target/scala-2.13/classes}:/opt/spark/jars/*" \
  "${GRAFT_MAIN:-graft.Bench}" "$@"
