#!/bin/bash
# java-direct runner for graft mains (graft.Verify / graft.Bench /
# graft.ScaleSoak) — same JVM flags sbt's `run / fork` injects (see
# build.sbt jdk17AddOpens), but without taking the sbt build lock, so
# a long verify/bench can run while compiles continue.
# Usage: tools/run_graft.sh <mainClass> [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS="java.base/java.lang java.base/java.lang.invoke \
java.base/java.lang.reflect java.base/java.io java.base/java.net \
java.base/java.nio java.base/java.util java.base/java.util.concurrent \
java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
java.base/sun.nio.cs java.base/sun.security.action \
java.base/sun.util.calendar"
FLAGS=()
for p in $OPENS; do FLAGS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-16g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
