#!/bin/bash
# Standing sf0.1 -> sf1 scaling sweep (VERDICT r6 #5): single-rep full
# query surface at both tiers, ratios table written to SWEEP_<tag>.md.
# Run per round, and on every NEW query at birth via
#   SPARK_GRAFT_BENCH_ONLY=<regex> tools/sweep.sh <tag>
# Requires `sbt compile` to have populated target/scala-2.13/classes.
#
# Usage: tools/sweep.sh r07 [mult]      (mult defaults to 10 -> sf1)
set -euo pipefail
cd "$(dirname "$0")/.."
TAG=${1:?usage: sweep.sh <tag> [mult]}
MULT=${2:-10}
SFDIR=/tmp/testdata_sf$(python3 -c "print($MULT/10 if $MULT%10 else $MULT//10)")
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# Spark 4.x on JDK 17 (same list as build.sbt's jdk17AddOpens): without
# these a run that SPILLS dies in KryoSerializer setup ("Unable to make
# field ... java.nio.ByteBuffer.hb accessible") — the unconstrained-
# memory path never instantiates Kryo, so the gap only shows at scale.
JOPTS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
    java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic; do
  printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done
  printf -- "--add-opens java.base/sun.nio.ch=ALL-UNNAMED "
  printf -- "--add-opens java.base/sun.nio.cs=ALL-UNNAMED "
  printf -- "--add-opens java.base/sun.security.action=ALL-UNNAMED "
  printf -- "--add-opens java.base/sun.util.calendar=ALL-UNNAMED")
# match build.sbt: the 290-query surface pressures the default 240m
# C2 code cache (SCALE.md round 12)
JOPTS="$JOPTS -XX:ReservedCodeCacheSize=512m"

[ -d "$SFDIR" ] || python3 tools/gen_sfx.py "$MULT" "$SFDIR"

run() { # run <sfdir> <out.json>
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_REPS=1 \
    java -cp "$CP" $JOPTS -Xmx48g graft.Bench >/dev/null 2>"$2.log"
  mv bench.json "$2"
}

run /root/testdata/sf0.1 /tmp/sweep_${TAG}_sf01.json
run "$SFDIR" /tmp/sweep_${TAG}_sfN.json

{
  echo "# Scaling sweep $TAG (sf0.1 -> ${MULT}x, single rep, local[8])"
  echo
  python3 tools/sweep_ratio.py /tmp/sweep_${TAG}_sf01.json \
    /tmp/sweep_${TAG}_sfN.json "$MULT"
} > "SWEEP_${TAG}.md"
echo "wrote SWEEP_${TAG}.md"
