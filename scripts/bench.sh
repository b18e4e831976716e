#!/usr/bin/env bash
# Driver-facing bench capture with a parse-proof contract:
#
#   1. compilation happens BEFORE the capture and off stdout (sbt's
#      [info]/[success] chatter after the JSON is what left three rounds
#      of BENCH_r*.json with "parsed": null);
#   2. graft.Bench runs as a bare JVM (the same recipe as
#      scripts/bench_gate.py / check.py — no sbt in the timed path);
#   3. the LAST stdout line is ALWAYS exactly one JSON object: the
#      bench's own compact summary line, re-printed by this script after
#      everything else, so a last-line parser cannot miss;
#   4. the exit status is 0 only for a clean capture — a run that
#      self-stamps "contended": true exits 3, so automation cannot
#      promote it (the full capture is still written for diagnosis).
#
# Usage: scripts/bench.sh [queryName ...]
#   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
#        SPARK_GRAFT_CPUS   (default 32)
#        SPARK_GRAFT_BENCH_OUT (optional explicit capture path)
set -u -o pipefail
cd "$(dirname "$0")/.."

SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"

# Build quietly first; a compile failure must still end with one JSON line.
if ! sbt -batch compile >/tmp/graft_bench_compile.log 2>&1; then
  tail -20 /tmp/graft_bench_compile.log >&2
  echo '{"metric":"total","value":-1,"unit":"sec","error":"compile failed","contended":true}'
  exit 2
fi

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

STDOUT_CAP="$(mktemp /tmp/graft_bench_stdout.XXXXXX)"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  java -Xmx8g $OPENS -Dspark.ui.enabled=false \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench "$@" | tee "$STDOUT_CAP"
RC=${PIPESTATUS[0]}

# graft.Bench prints the full capture JSON and then a compact summary as
# its own last line; re-print that summary so it is the final stdout line
# of THIS process no matter what tee/JVM shutdown interleaved.
SUMMARY="$(grep '^{' "$STDOUT_CAP" | tail -1)"
rm -f "$STDOUT_CAP"
if [ "$RC" -ne 0 ] || [ -z "$SUMMARY" ]; then
  echo '{"metric":"total","value":-1,"unit":"sec","error":"bench run failed","contended":true}'
  exit 2
fi
echo "$SUMMARY"
case "$SUMMARY" in
  *'"contended":true'*) exit 3 ;;
esac
exit 0
