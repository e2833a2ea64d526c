#!/usr/bin/env bash
# Run a graft main class against the compiled sbt output + /opt/spark/jars
# without spinning up sbt (no build-server lock contention with a live
# `sbt test`). Usage: run_main.sh [-Xmx...] graft.Bench [args...]
# Env: SPARK_DRIVER_MEM (default 8g) sizes the heap like build.sbt does.
set -euo pipefail
cd "$(dirname "$0")/.."
XMX="${SPARK_DRIVER_MEM:-8g}"
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPENS=()
for p in "${ADD_OPENS[@]}"; do OPENS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${OPENS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx$XMX" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
