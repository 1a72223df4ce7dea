#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars without sbt
# startup overhead. Usage: tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/out
set -e
CLS="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# GRAFT_CLASSPATH overrides the live sbt output dir — point it at a
# snapshot copy when a long background run must not race a recompile
# (sbt rewrites .class files in place; a mid-run reload then throws
# NoClassDefFound for whatever class loaded next).
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "${GRAFT_CLASSPATH:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*" "$CLS" "$@"
