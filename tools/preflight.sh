#!/usr/bin/env bash
# Snapshot preflight — run before ANY end-of-round (or milestone) commit.
# Round 7's lesson: a snapshot commit is a release, not a save-point; 67
# uncompiled lines redded out 496 turns of green work. This script makes
# that impossible to repeat cheaply:
#
#   tools/preflight.sh                 # compile main+test (the minimum bar)
#   tools/preflight.sh -t             # + full ScalaTest suite
#   tools/preflight.sh q84_lm_perplexity,q78_pivot
#                                      # + targeted Verify/check.py oracle
#                                      #   gate at sf0.001 for the named
#                                      #   queries (anything touched since
#                                      #   the last artifact refresh)
#
# Exit nonzero on any failure. Usage contract: green preflight THEN commit.
set -euo pipefail
cd "$(dirname "$0")/.."

RUN_TESTS=0
QUERIES=""
for a in "$@"; do
  case "$a" in
    -t) RUN_TESTS=1 ;;
    *) QUERIES="$a" ;;
  esac
done

echo "[preflight] Test/compile ..."
sbt -batch "Test/compile" > /tmp/preflight_compile.log 2>&1 || {
  echo "[preflight] COMPILE FAILED:"; grep -E "^\[error\]" /tmp/preflight_compile.log | head -30; exit 1; }
echo "[preflight] compile green"

if [ "$RUN_TESTS" = "1" ]; then
  echo "[preflight] sbt test ..."
  sbt -batch test > /tmp/preflight_test.log 2>&1 || {
    echo "[preflight] TESTS FAILED:"; grep -E "TESTS FAILED|\*\*\* FAILED|^\[error\]" /tmp/preflight_test.log | head -30; exit 1; }
  grep -E "All tests passed|Total number" /tmp/preflight_test.log | tail -2
fi

if [ -n "$QUERIES" ]; then
  OUT=/tmp/preflight_verify
  rm -rf "$OUT"
  echo "[preflight] targeted gate: $QUERIES at sf0.001 ..."
  SPARK_GRAFT_ONLY="$QUERIES" sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $OUT" \
    > /tmp/preflight_verify.log 2>&1 || {
    echo "[preflight] VERIFY FAILED:"; tail -30 /tmp/preflight_verify.log; exit 1; }
  python3 tools/check.py /root/testdata/sf0.001 "$OUT" oracle_sql.subset.json || {
    echo "[preflight] ORACLE GATE FAILED"; exit 1; }
fi

echo "[preflight] GREEN — safe to commit"
