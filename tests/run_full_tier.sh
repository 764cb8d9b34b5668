#!/bin/sh
# Full test tier on a wall-clock budget (COVERAGE.md "Test tiers").
#
# The sandbox has no pytest-xdist, so the split is process-level — three
# concurrent pytest processes (separate JVMs; app-scoped staging dirs
# keep them isolated; they share only the read-only testdata):
#
#   parity — the DuckDB-hash sweeps (-m parity): the 201-case registry
#            sweep + the retired-row sweep       (~5 min)
#   slow   — the rest of the slow tier (-m "slow and not parity"):
#            property suites, crash-injection + lifecycle index tests,
#            registry-wide plan sweeps, equivalence stress, streaming
#            batch-parity, swap-candidate staging  (~15 min — the
#            critical path)
#   core   — everything unmarked (-m "not slow")   (~5 min)
#
# Wall time is max(slow half) instead of the 30:15 a single process
# measured at the r14 HEAD. Each process gets a third of the cores;
# Spark jobs at test scale are scheduling-bound, not core-bound.
#
# Usage: tests/run_full_tier.sh [extra pytest args for ALL thirds]
set -u
cd "$(dirname "$0")/.."

THIRD_CPUS=${SPARK_GRAFT_TIER_CPUS:-10}

SPARK_GRAFT_CPUS=$THIRD_CPUS python -m pytest tests/ -m parity -q "$@" \
    >/tmp/full_tier_parity.log 2>&1 &
parity_pid=$!
SPARK_GRAFT_CPUS=$THIRD_CPUS python -m pytest tests/ -m "slow and not parity" -q "$@" \
    >/tmp/full_tier_slow.log 2>&1 &
slow_pid=$!
SPARK_GRAFT_CPUS=$THIRD_CPUS python -m pytest tests/ -m "not slow" -q "$@" \
    >/tmp/full_tier_core.log 2>&1 &
core_pid=$!

wait "$parity_pid"; parity_rc=$?
wait "$slow_pid"; slow_rc=$?
wait "$core_pid"; core_rc=$?

echo "== parity third (rc=$parity_rc) =="
tail -n 3 /tmp/full_tier_parity.log
echo "== slow third (rc=$slow_rc) =="
tail -n 3 /tmp/full_tier_slow.log
echo "== core third (rc=$core_rc) =="
tail -n 3 /tmp/full_tier_core.log

[ "$parity_rc" -eq 0 ] && [ "$slow_rc" -eq 0 ] && [ "$core_rc" -eq 0 ]
