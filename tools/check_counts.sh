#!/usr/bin/env bash
# Round-close count gate: the query/spec counts quoted in the committed
# docs must EQUAL the artifacts'. Usage:
#   sbt -batch test 2>&1 | tee /tmp/test.log     # (once, at round close)
#   tools/check_counts.sh /tmp/test.log
# Exits 1 on any drift, printing expected-vs-found.
set -u
cd "$(dirname "$0")/.."
LOG="${1:?usage: check_counts.sh <sbt-test-log>}"

QUERIES=$(sbt -batch "runMain graft.tools.Counts" 2>/dev/null \
  | grep -oP 'queries=\K[0-9]+')
SPECS=$(grep -oP 'Tests: succeeded \K[0-9]+' "$LOG" | tail -1)
SUITES=$(grep -oP 'Suites: completed \K[0-9]+' "$LOG" | tail -1)
FAILED=$(grep -oP 'Tests: succeeded [0-9]+, failed \K[0-9]+' "$LOG" | tail -1)

echo "artifacts: queries=$QUERIES specs=$SPECS suites=$SUITES failed=$FAILED"
[ -z "$QUERIES" ] && { echo "FAIL: could not read query count"; exit 1; }
[ -z "$SPECS" ] && { echo "FAIL: could not read spec count from $LOG"; exit 1; }
[ "$FAILED" != "0" ] && { echo "FAIL: test log shows $FAILED failures"; exit 1; }

rc=0
check() { # check <file> <regex-with-COUNT-placeholder> <expected> <label>
  local file=$1 re=$2 want=$3 label=$4
  local hits
  hits=$(grep -oP "$re" "$file" || true)
  for h in $hits; do
    if [ "$h" != "$want" ]; then
      echo "DRIFT: $file claims $label=$h, artifact says $want"
      rc=1
    fi
  done
}
# every "<N> oracle queries" / "<N> specs across <M> suites" in the
# round-CURRENT sections must match (historical addenda quote their own
# rounds' numbers and are exempt: only lines tagged [current] are checked)
grep -n "\[current\]" README.md SURVEY.md COVERAGE.md 2>/dev/null | while read -r line; do
  f=${line%%:*}
  n=$(echo "$line" | grep -oP '\K[0-9]+(?= oracle queries)' | head -1)
  s=$(echo "$line" | grep -oP '\K[0-9]+(?= specs)' | head -1)
  [ -n "${n:-}" ] && [ "$n" != "$QUERIES" ] \
    && { echo "DRIFT: $f [current] claims $n queries, artifact says $QUERIES"; exit 9; }
  [ -n "${s:-}" ] && [ "$s" != "$SPECS" ] \
    && { echo "DRIFT: $f [current] claims $s specs, artifact says $SPECS"; exit 9; }
done
[ $? -eq 9 ] && rc=1

[ $rc -eq 0 ] && echo "OK: doc counts match artifacts"
exit $rc
