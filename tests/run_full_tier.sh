#!/bin/sh
# Full test tier on a wall-clock budget (COVERAGE.md "Test tiers").
#
# The sandbox has no pytest-xdist, so the split is process-level: the
# DuckDB-hash parity sweeps (-m parity: the 201-case registry sweep +
# the retired-row sweep — the full tier's biggest sequential chunk) run
# CONCURRENTLY with everything else (-m "not parity"). The two pytest
# processes are separate JVMs with app-scoped staging dirs
# (operators/similarity._ivf_index_path keys on applicationId), so they
# share nothing but the read-only testdata. Each gets half the cores;
# Spark jobs at test scale are scheduling-bound, not core-bound, so the
# halves lose little and the wall time is max(half) instead of sum.
#
# Usage: tests/run_full_tier.sh [extra pytest args for BOTH halves]
set -u
cd "$(dirname "$0")/.."

HALF_CPUS=${SPARK_GRAFT_TIER_CPUS:-16}

SPARK_GRAFT_CPUS=$HALF_CPUS python -m pytest tests/ -m parity -q "$@" \
    >/tmp/full_tier_parity.log 2>&1 &
parity_pid=$!
SPARK_GRAFT_CPUS=$HALF_CPUS python -m pytest tests/ -m "not parity" -q "$@" \
    >/tmp/full_tier_rest.log 2>&1 &
rest_pid=$!

wait "$parity_pid"; parity_rc=$?
wait "$rest_pid"; rest_rc=$?

echo "== parity half (rc=$parity_rc) =="
tail -n 3 /tmp/full_tier_parity.log
echo "== rest half (rc=$rest_rc) =="
tail -n 3 /tmp/full_tier_rest.log

[ "$parity_rc" -eq 0 ] && [ "$rest_rc" -eq 0 ]
