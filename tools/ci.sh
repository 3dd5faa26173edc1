#!/usr/bin/env bash
# Full local gate: compile, tests, oracle correctness, bench.
# Usage: tools/ci.sh [sfDir-for-verify] [sfDir-for-bench]
set -euo pipefail
cd "$(dirname "$0")/.."
VSF="${1:-/root/testdata/sf0.01}"
BSF="${2:-/root/testdata/sf0.1}"
OUT="$(mktemp -d)/verify"

echo "== sbt test =="
sbt -batch test 2>&1 | grep -E "Tests:|FAILED" | tail -2

echo "== Session-config invariance sweeps (sf0.001, all axes) =="
# Each axis diffs every registered query base-vs-alt with a canonical
# hash (see DevConfSweep's scaladoc); a caller on a real cluster varies
# all of these, so DIFF/ERROR here is a shipped bug even when the
# pinned-session oracle gate below is green. ~5 min/axis at sf0.001
# (the sweep runs every query at least twice); sbt exits nonzero on
# any DIFF/ERROR and pipefail stops the gate.
for axis in ansi codegen partitions aqe broadcast; do
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    sbt -batch "runMain graft.DevConfSweep $axis /root/testdata/sf0.001" \
    2>&1 | grep -E 'SUMMARY' | sed 's/^\[info\] //'
done

echo "== Planted-skew join (AQE skew-split, 40M rows, ~1 min) =="
# Gates that the engine's shuffle-join shape stays AQE-skew-eligible
# AND that the runtime split engages and pays on a planted 30%-hot
# key; writes its report to a temp file so committed docs/SKEW_SCALE.md
# timings only change when regenerated deliberately.
sbt -batch "runMain graft.examples.SkewScale 40000000 $(mktemp -d)/skew.md" \
  2>&1 | grep -E 'ALL CHECKS PASS|FAILURES' | sed 's/^\[info\] //'

echo "== Verify + DuckDB oracle ($VSF) =="
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify $VSF $OUT" >/dev/null 2>&1
python3 tools/oracle_check.py "$VSF" "$OUT" | tail -3

echo "== Streaming state-provider axis (6 *_state gates, both providers) =="
# RocksDB is the documented 100-TB state-store default
# (docs/STREAM_SCALE.md); the gates must be oracle-green under it,
# not only under the stock HDFS provider the main gate above runs.
# Same correctness assertions, conf flip only (r11 verdict item 4).
STATE_GATES="dedup_stream_state,interval_join_state,interval_join_evict_state,window_hourly_state,sessionize_state,sink_exactly_once_state"
for state_provider in hdfs rocksdb; do
  SOUT="$(mktemp -d)/verify_$state_provider"
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    SPARK_GRAFT_STATE_PROVIDER="$state_provider" \
    SPARK_GRAFT_ONLY="$STATE_GATES" \
    sbt -batch "runMain graft.Verify $VSF $SOUT" >/dev/null 2>&1
  echo -n "state_provider=$state_provider: "
  python3 tools/oracle_check.py "$VSF" "$SOUT" | tail -1
done

echo "== Bench ($BSF) =="
# cpus=32 is the driver's bench methodology — every committed timing
# table (bench_results.json, docs/BENCH_*.md) uses it; a different
# core count writes a sidecar that is not comparable to any of them.
SPARK_GRAFT_SF_DIR="$BSF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' \
  | sed 's/^\[info\] //'
