#!/usr/bin/env bash
# Round-16 opening job (r15 verdict #1): the 32k-merge BPE training,
# end-to-end, launched FIRST because its ~4-5 h driver-coordinated wall
# (measured three-point curve: 0.53 / 0.517 / 0.745 s/round at
# 600 / 5k / 16k merges, fill decaying toward ~1.6) is the round's long
# pole. Runs against a SNAPSHOT of the compiled classes
# (/tmp/graft_classes_r16) so sbt recompiles during the round cannot
# swap class files under the live JVM's lazy classloading.
#
# NOTE (protocol): the first ~1-2 h of this window absorbs the round's
# compile/spec cycles — the per-round cost it reports carries that
# contamination caveat exactly as the r15 16k row did; the END-TO-END
# completion + artifact + determinism pin is the deliverable.
set -uo pipefail
cd "$(dirname "$0")/.."
CLASSES="${GRAFT_CLASSES:-/tmp/graft_classes_r16}"
XMX="${SPARK_DRIVER_MEM:-48g}"
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
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.tools.Bpe32k /tmp/graft_zipf 32000 /tmp/graft_tok32k /root/testdata/sf0.01
