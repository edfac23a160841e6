#!/usr/bin/env bash
# dev/gate.sh — the round gate as ONE command (r14 verdict #7): the
# six pre-snapshot checks the workflow requires, each printing a
# PASS/FAIL line, exit non-zero if any fails. Cite its output in the
# round snapshot commit. Expected wall: ~22 min (suite ~9, census
# selfcheck+crosssf ~6, drain budgets ~4, canary freshness ~2).
#
#   ./dev/gate.sh               # all six checks
#   ./dev/gate.sh --no-suite    # skip the full suite (dev iteration only
#                               # — a snapshot commit needs the full run)
#   ./dev/gate.sh --no-drains   # skip the drain budget gate (ditto)
#   ./dev/gate.sh --no-canaries # skip the canary freshness gate (ditto)
set -u
cd "$(dirname "$0")/.."
fail=0
note() { printf 'GATE %-12s %s\n' "$1" "$2"; }

# flag parsing over ALL args (r15 ADVICE: only $1 was inspected, so
# `gate.sh --anything --no-suite` silently ran the full suite and an
# unknown flag was silently ignored)
no_suite=0
no_drains=0
no_canaries=0
for arg in "$@"; do
  case "$arg" in
    --no-suite) no_suite=1 ;;
    --no-drains) no_drains=1 ;;
    --no-canaries) no_canaries=1 ;;
    *) echo "usage: $0 [--no-suite] [--no-drains] [--no-canaries]  (unknown argument: $arg)" >&2; exit 2 ;;
  esac
done

# 1. FULL test suite (r13 post-mortem: testOnly cannot reproduce
#    warm-shared-session failures; the suite result + wall time goes
#    in the snapshot commit message)
if [ "$no_suite" = 1 ]; then
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
#    the census main prints `registry: N queries = B batch + D drains`
#    derived from SparkEntry.queries itself (r15 ADVICE: a source-
#    formatting grep flipped this gate for the wrong reason); the
#    committed census fixture must match the batch count, and README /
#    COVERAGE totals must match the registry total
reg=$(grep -oE 'registry: [0-9]+ queries = [0-9]+ batch \+ [0-9]+ drains' /tmp/gate_census.log | head -1)
total=$(echo "$reg" | grep -oE '[0-9]+' | sed -n 1p)
nbatch=$(echo "$reg" | grep -oE '[0-9]+' | sed -n 2p)
ndrain=$(echo "$reg" | grep -oE '[0-9]+' | sed -n 3p)
nfixture=$(wc -l < src/test/resources/exchange_counts.tsv)
readme=$(grep -oE '[0-9]+ registered queries' README.md | head -1 | grep -oE '[0-9]+')
cover=$(grep -oE 'Totals: [0-9]+ registered queries' docs/COVERAGE.md | grep -oE '[0-9]+')
# the verify skill's expected-counts line must track the registry too
# (r17 verdict #7: it went stale in r16 and cost the next session time)
skill=$(grep -oE 'over [0-9]+ queries' .claude/skills/verify/SKILL.md | head -1 | grep -oE '[0-9]+')
if [ -z "$total" ]; then
  note doc-counts "FAIL census log has no registry line (census crashed?)"
  fail=1
elif [ "$nbatch" != "$nfixture" ]; then
  note doc-counts "FAIL registry has $nbatch batch queries but census fixture has $nfixture rows"
  fail=1
elif [ "$total" = "$readme" ] && [ "$total" = "$cover" ] && [ "$total" = "$skill" ]; then
  note doc-counts "PASS registry=$total ($nbatch batch + $ndrain drains) = fixture = README = COVERAGE = verify-skill"
else
  note doc-counts "FAIL registry=$total ($nbatch batch + $ndrain drains), README=$readme, COVERAGE=$cover, verify-skill=$skill"
  fail=1
fi

# 5. drain budget gate (r15 verdict #6): the census pins batch plans
#    by name; this pins each q_stream_* drain's median-of-3 runtime
#    against src/test/resources/drain_budgets.tsv (2x the committed
#    steady-state medians) so a drain drifting 7 -> 14 s fails BY NAME
#    pre-snapshot instead of surfacing as trio archaeology. Runs under
#    the bench isolation conditions (RAM-backed stream tmp, deferred
#    maintenance). Median-of-3 keeps a single co-load blip from
#    flipping it; a FAIL on an obviously-busy host is re-runnable.
if [ "$no_drains" = 1 ]; then
  note drains "SKIP (--no-drains; NOT sufficient for a snapshot commit)"
elif sbt -batch "runMain graft.tools.DrainGate" >/tmp/gate_drains.log 2>&1; then
  note drains "PASS $(grep -c 'drain ok' /tmp/gate_drains.log) drains within budget"
else
  note drains "FAIL $(grep -E 'OVER BUDGET|UNBUDGETED|STALE' /tmp/gate_drains.log | head -3 | tr '\n' '; ')(/tmp/gate_drains.log)"
  fail=1
fi

# 6. canary budget freshness gate (r17 verdict #5): the bench's
#    absolute anchor (canary_budgets.tsv) gets the same self-
#    maintenance the drains got in r17 — the fixture medians are
#    drift-gated (2x either way, per-canary slack printed) against
#    the newest comparable FULL-registry bench legs in the working
#    dir (the trio provides them; a cold standalone measuring session
#    times C2/memo warmup, not steady state — measured 3-6x over on
#    every canary, so legs are the honest yardstick). Fails when the
#    anchor drifted loose after a speedup, when a canary regressed
#    vs the committed legs, or when no usable leg exists.
if [ "$no_canaries" = 1 ]; then
  note canaries "SKIP (--no-canaries; NOT sufficient for a snapshot commit)"
elif sbt -batch "runMain graft.tools.CanaryBudgets --check" >/tmp/gate_canaries.log 2>&1; then
  note canaries "PASS $(grep 'canary ok' /tmp/gate_canaries.log | head -1)"
else
  note canaries "FAIL $(grep -E 'CANARY' /tmp/gate_canaries.log | head -3 | tr '\n' '; ')(/tmp/gate_canaries.log)"
  fail=1
fi

if [ "$fail" = 0 ]; then note TOTAL "PASS"; else note TOTAL "FAIL"; fi
exit $fail
