#!/usr/bin/env bash
# Two-session concurrency proof (round-7 VERDICT item 5).
#
# Launches TWO independent Verify JVMs at the same instant over the SAME
# sfDir, each writing to its own outDir, then oracle-checks both dumps.
# This exercises the pid-keyed scratch paths (Scratch.dir: IVF layouts,
# manifest warehouses, epoch sinks, the q172 curated corpus, ...): if any
# two operators collided on /tmp scratch, one session's files would be
# clobbered mid-write and its gate row would fail the oracle compare.
#
# Usage: tools/concurrent_verify.sh [sfDir] [workDir]
# Writes $workDir/{a,b}/ dumps plus $workDir/report.txt, exits non-zero
# unless BOTH sessions are fully green.
set -u
SF=${1:-/root/testdata/sf0.001}
WORK=${2:-/tmp/graft_concurrent}
REPO=$(cd "$(dirname "$0")/.." && pwd)
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

rm -rf "$WORK"; mkdir -p "$WORK"
echo "launching two concurrent Verify sessions over $SF ..."
# 16 threads each so the two JVMs genuinely overlap on a 32-core host
SPARK_GRAFT_CPUS=16 java -cp "$CP" -Xmx${GRAFT_VERIFY_MEM:-12g} $OPENS graft.Verify "$SF" "$WORK/a" \
  >"$WORK/a.log" 2>&1 &
PA=$!
SPARK_GRAFT_CPUS=16 java -cp "$CP" -Xmx${GRAFT_VERIFY_MEM:-12g} $OPENS graft.Verify "$SF" "$WORK/b" \
  >"$WORK/b.log" 2>&1 &
PB=$!
wait $PA; RA=$?
wait $PB; RB=$?
echo "session A exit=$RA, session B exit=$RB"

FAIL=0
for S in a b; do
  python3 "$REPO/tools/oracle_check.py" "$SF" "$WORK/$S" >"$WORK/$S.oracle.txt" 2>&1
  TAIL=$(tail -1 "$WORK/$S.oracle.txt")
  echo "session $S: $TAIL"
  N_OK=$(echo "$TAIL" | cut -d/ -f1)
  N_ALL=$(echo "$TAIL" | sed 's/.*\///; s/ .*//')
  [ "$N_OK" = "$N_ALL" ] || FAIL=1
done
{
  echo "concurrent_verify: sfDir=$SF date=$(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "session A: $(tail -1 "$WORK/a.oracle.txt") (exit=$RA)"
  echo "session B: $(tail -1 "$WORK/b.oracle.txt") (exit=$RB)"
  echo "verdict: $([ $FAIL -eq 0 ] && echo BOTH_GREEN || echo FAILED)"
} | tee "$WORK/report.txt"
exit $FAIL
