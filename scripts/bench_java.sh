#!/bin/bash
# Run graft.Bench via plain `java` (no sbt): decoupled from the sbt
# server/target lock so a concurrent compile can never kill the bench.
# Classpath = compiled classes + /opt/spark/jars + scala-library from the
# coursier cache (same set build.sbt assembles). Compile FIRST (sbt -batch
# compile) — this script does not compile.
set -euo pipefail
cd /root/repo
# scala-library ships in /opt/spark/jars; a coursier copy (if any) is a
# harmless addition. pipefail + set -e: the lookup must never abort us.
SCALA_LIB=$( (ls "$HOME"/.cache/coursier/v1/https/repo1.maven.org/maven2/org/scala-lang/scala-library/2.13.*/scala-library-2.13.*.jar 2>/dev/null || true) | sort | tail -1)
CP="target/scala-2.13/classes:/opt/spark/jars/*"
if [ -n "${SCALA_LIB:-}" ]; then CP="$CP:$SCALA_LIB"; fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" -cp "$CP" graft.Bench
