#!/usr/bin/env bash
# dev/gate.sh — the round gate as ONE command (r14 verdict #7): the
# four pre-snapshot checks the workflow requires, each printing a
# PASS/FAIL line, exit non-zero if any fails. Cite its output in the
# round snapshot commit. Expected wall: ~15 min (suite ~9, census
# selfcheck+crosssf ~6).
#
#   ./dev/gate.sh            # all four checks
#   ./dev/gate.sh --no-suite # skip the full suite (dev iteration only
#                            # — a snapshot commit needs the full run)
set -u
cd "$(dirname "$0")/.."
fail=0
note() { printf 'GATE %-12s %s\n' "$1" "$2"; }

# 1. FULL test suite (r13 post-mortem: testOnly cannot reproduce
#    warm-shared-session failures; the suite result + wall time goes
#    in the snapshot commit message)
if [ "${1:-}" = "--no-suite" ]; then
  note suite "SKIP (--no-suite; NOT sufficient for a snapshot commit)"
else
  t0=$(date +%s)
  if sbt -batch test >/tmp/gate_test.log 2>&1; then
    line=$(grep -E "Tests: succeeded" /tmp/gate_test.log | tail -1 | sed 's/.*Tests: //')
    note suite "PASS ${line} ($(( $(date +%s) - t0 )) s)"
  else
    note suite "FAIL (see /tmp/gate_test.log)"
    fail=1
  fi
fi

# 2. exchange census: materialization invariance (r13 red-suite mode)
#    + cross-sf broadcast-flip guard (r14 verdict #3)
if sbt -batch "runMain graft.tools.ExchangeCensus --selfcheck --crosssf" >/tmp/gate_census.log 2>&1; then
  note census "PASS $(grep -E 'selfcheck OK|crosssf OK' /tmp/gate_census.log | tr '\n' '; ')"
else
  note census "FAIL $(grep -E 'NOT materialization|UNDOCUMENTED' /tmp/gate_census.log | head -2 | tr '\n' '; ')(/tmp/gate_census.log)"
  fail=1
fi

# 3. leak grep: credentials / private endpoints / webhook shapes must
#    never appear in the shipped tree (the driver runs its own
#    LEAKCHECK; this is the local pre-commit guard)
LEAK='AKIA[0-9A-Z]{16}|BEGIN [A-Z ]*PRIVATE KEY|hooks\.slack\.com|xox[baprs]-|aws_secret|secret_key\s*=|password\s*=\s*["'"'"'][^"'"'"']+|corp\.|\.internal[/:"]|ghp_[A-Za-z0-9]{20,}'
hits=$(grep -rInE "$LEAK" src build.sbt docs README.md dev 2>/dev/null | grep -v 'dev/gate.sh' || true)
if [ -z "$hits" ]; then
  note leaks "PASS 0 hits"
else
  note leaks "FAIL $(echo "$hits" | wc -l) hits:"; echo "$hits" | head -5
  fail=1
fi

# 4. doc-count consistency: the registry is the source of truth —
#    batch queries = committed census fixture rows, drains = the
#    registry entries the census intentionally skips; README and
#    COVERAGE totals must match it (the most common round-end miss)
nbatch=$(wc -l < src/test/resources/exchange_counts.tsv)
ndrain=$(grep -cE '"q_stream_[a-z0-9_]+" *->' src/main/scala/graft/streaming/StreamQueries.scala)
total=$((nbatch + ndrain))
readme=$(grep -oE '[0-9]+ registered queries' README.md | head -1 | grep -oE '[0-9]+')
cover=$(grep -oE 'Totals: [0-9]+ registered queries' docs/COVERAGE.md | grep -oE '[0-9]+')
if [ "$total" = "$readme" ] && [ "$total" = "$cover" ]; then
  note doc-counts "PASS registry=$total ($nbatch batch + $ndrain drains) = README = COVERAGE"
else
  note doc-counts "FAIL registry=$total ($nbatch batch + $ndrain drains), README=$readme, COVERAGE=$cover"
  fail=1
fi

if [ "$fail" = 0 ]; then note TOTAL "PASS"; else note TOTAL "FAIL"; fi
exit $fail
