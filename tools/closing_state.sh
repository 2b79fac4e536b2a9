#!/usr/bin/env bash
# Closing-state counts derived from the artifacts themselves — never
# sed-edited prose (round-13 item 8: two earlier true-ups silently
# no-op'd). Usage: tools/closing_state.sh [sbt-test-log]
# Paste the output block into the SURVEY closing state verbatim.
set -euo pipefail
cd "$(dirname "$0")/.."

rows=$(grep -c '^| [0-9]\+[a-z]* |' SURVEY.md || true)
queries=$(grep -o '"q[0-9]\+_[a-z0-9_]*"' src/main/scala/graft/SparkEntry.scala | sort -u | wc -l)
# every key occurs as a map ENTRY once in `queries` and once (if gated)
# in `oracleSql`: oracle entries = entry occurrences − distinct keys
occur=$(grep -c '"q[0-9]\+_[a-z0-9_]*" ->' src/main/scala/graft/SparkEntry.scala)
oracles=$((occur - queries))
fuzz=$(grep -c 'test("fuzz' src/test/scala/graft/StatFuzzSpec.scala)
shapes=$(grep -c 'Shape("' src/test/scala/graft/PlanShapeSpec.scala)
extra_plan=$(grep -c '^  test("' src/test/scala/graft/PlanShapeSpec.scala)
suites=$(ls src/test/scala/graft/*Spec.scala | wc -l)

echo "SURVEY §2 rows:        $rows"
echo "query keys (distinct): $queries"
echo "oracle map entries:    $oracles"
echo "fuzz tests:            $fuzz"
echo "plan locks:            $shapes Shape entries + $extra_plan non-Shape plan tests"
echo "spec suites:           $suites"
if [ $# -ge 1 ] && [ -f "$1" ]; then
  total=$(grep -o 'Total number of tests run: [0-9]*' "$1" | tail -1 | grep -o '[0-9]*$')
  echo "tests run (from log):  ${total:-unknown}"
else
  echo "tests run:             (pass an sbt test log to count)"
fi
