#!/usr/bin/env bash
# Round-close count gate: the query/spec counts quoted in the committed
# docs must EQUAL the artifacts'. Usage:
#   sbt -batch test 2>&1 | tee /tmp/test.log     # (once, at round close)
#   tools/check_counts.sh /tmp/test.log
# Exits 1 on any drift, printing expected-vs-found.
set -u
cd "$(dirname "$0")/.."
LOG="${1:?usage: check_counts.sh <sbt-test-log>}"

# run Counts and PROPAGATE its failure: the tool requires oracleSql keys
# to be a subset of queries and aborts before printing on violation
COUNTS_OUT=$(sbt -batch "runMain graft.tools.Counts" 2>&1)
if [ $? -ne 0 ] || ! echo "$COUNTS_OUT" | grep -q 'queries='; then
  echo "FAIL: graft.tools.Counts failed (dangling oracle key or build error):"
  echo "$COUNTS_OUT" | grep -E "requirement|error" | head -5
  exit 1
fi
QUERIES=$(echo "$COUNTS_OUT" | grep -oP 'queries=\K[0-9]+' | tail -1)
SPECS=$(grep -oP 'Tests: succeeded \K[0-9]+' "$LOG" | tail -1)
SUITES=$(grep -oP 'Suites: completed \K[0-9]+' "$LOG" | tail -1)
FAILED=$(grep -oP 'Tests: succeeded [0-9]+, failed \K[0-9]+' "$LOG" | tail -1)

echo "artifacts: queries=$QUERIES specs=$SPECS suites=$SUITES failed=$FAILED"
[ -z "$QUERIES" ] && { echo "FAIL: could not read query count"; exit 1; }
[ -z "$SPECS" ] && { echo "FAIL: could not read spec count from $LOG"; exit 1; }
[ "$FAILED" != "0" ] && { echo "FAIL: test log shows $FAILED failures"; exit 1; }

# every [current]-tagged line in the docs must quote the artifact counts
# (historical addenda quote their own rounds' numbers and are exempt)
rc=0
while IFS= read -r line; do
  f=${line%%:*}
  n=$(echo "$line" | grep -oP '\K[0-9]+(?= oracle queries)' | head -1)
  s=$(echo "$line" | grep -oP '\K[0-9]+(?= specs)' | head -1)
  if [ -n "${n:-}" ] && [ "$n" != "$QUERIES" ]; then
    echo "DRIFT: $f [current] claims $n queries, artifact says $QUERIES"; rc=1
  fi
  if [ -n "${s:-}" ] && [ "$s" != "$SPECS" ]; then
    echo "DRIFT: $f [current] claims $s specs, artifact says $SPECS"; rc=1
  fi
done < <(grep -n "\[current\]" README.md SURVEY.md COVERAGE.md 2>/dev/null)

[ $rc -eq 0 ] && echo "OK: doc counts match artifacts"
exit $rc
