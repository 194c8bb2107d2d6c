#!/bin/bash
# Run a graft main class against the compiled classes + Spark jars,
# bypassing sbt (so tools can run while sbt is busy).
# Usage: tools/run.sh [-mem 24g] graft.Verify args...
MEM=24g
if [ "$1" = "-mem" ]; then MEM=$2; shift 2; fi
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx$MEM $OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" "$@"
