"""Query + oracle registry — the driver-facing coverage inventory.

Every implemented operator from SURVEY.md §2 registers here as
``(name, callable(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
``__spark_entry__.queries()`` / ``oracle_sql()`` read from this module.

Registration ORDER is deliberate: the driver's correctness gate verifies a
bounded prefix of the registry (each round records exactly the first
``GATE_SLOTS`` entries), so the prefix must ROTATE per round for every
registered query to get driver-verified recently.  Rotation is COMPUTED,
not narrated: ``LAST_VERIFIED`` is derived at import time from the
``CORRECTNESS_r*.json`` gate files the driver writes at the repo root, and
the prefix is simply the ``GATE_SLOTS`` stalest registered names
(never-gated first, then oldest gate round, name as the deterministic
tie-break).  Adding a query automatically queues it for the next gate;
a completed gate round automatically rotates it out.  Everything outside
the prefix stays verified locally by tests/test_oracle_parity.py every
session, and tests/test_registry_rotation.py fails the build if any
registered query would exceed the staleness bound.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .plans.flagship import FLAGSHIP_ORACLE, flagship
from .plans import (
    analytics,
    breadth,
    capstone,
    formats,
    breadth2,
    deep_pipeline,
    engine_ops,
    etl_ops,
    events_queries,
    gen_serving,
    graph_queries,
    linkage,
    llm_ops,
    llm_ops2,
    llm_ops3,
    llm_ops4,
    llm_ops5,
    llm_ops6,
    llm_ops7,
    outbound,
    rag,
    relational,
    streaming_queries,
    temporal_queries,
    timeseries_queries,
    tpch_more,
    waterfall,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# ---------------------------------------------------------------------------
# Computed gate rotation.
#
# The driver verifies the first GATE_SLOTS entries of queries() each round and
# records the outcome in CORRECTNESS_r{N}.json at the repo root.  We read those
# files back to learn, per query, the most recent round with a green row
# ("green" = rows+schema+hash matched with no error, or — for the few
# non-SQL-expressible ops the driver checks rows-only — a populated spark_rows
# with err == "no_oracle").  The verified prefix is then DERIVED as the
# GATE_SLOTS stalest names, so rotation happens automatically: no hand-edited
# list, no per-round chore to forget.
# ---------------------------------------------------------------------------

GATE_SLOTS = 50

_REPO_ROOT = Path(__file__).resolve().parent.parent
_GATE_FILE_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def _gate_green(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None  # weaker rows-only check
    return bool(row.get("rows_match")) and row.get("err") is None


def _load_last_verified() -> tuple[dict[str, int], int]:
    """(name -> last gate-green round, upcoming round number)."""
    last: dict[str, int] = {}
    max_round = 0
    for path in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
        m = _GATE_FILE_RE.search(path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and _gate_green(row):
                last[name] = max(last.get(name, 0), rnd)
    return last, max_round + 1


#: name -> most recent round with a green driver-gate row (0 = never gated).
LAST_VERIFIED, CURRENT_ROUND = _load_last_verified()

#: Any registered query must have been gate-green within this many rounds
#: (never-gated queries must be in the upcoming prefix).  With ~190 queries
#: and 50 slots/round, full rotation takes 4 rounds — the bound is exactly
#: the steady-state maximum, so a single skipped rotation fails the test.
MAX_STALENESS_ROUNDS = 4


def _staleness_key(name: str) -> tuple[int, str]:
    return (LAST_VERIFIED.get(name, 0), name)

_ALL_MODULES = (
    capstone,
    deep_pipeline, llm_ops, llm_ops2, llm_ops3, llm_ops4, llm_ops5, llm_ops6,
    llm_ops7,
    linkage,
    gen_serving,
    events_queries,
    temporal_queries, timeseries_queries, streaming_queries, graph_queries,
    waterfall, outbound, etl_ops, engine_ops, formats, rag, analytics,
    relational,
    breadth, breadth2, tpch_more,
)

_by_name = {"flagship_prospect_pipeline": ("flagship_prospect_pipeline", flagship, FLAGSHIP_ORACLE)}
for _module in _ALL_MODULES:
    for _entry in _module.REGISTRY:
        _by_name[_entry[0]] = _entry

#: The upcoming round's driver-gate prefix: the GATE_SLOTS stalest names.
VERIFIED_PREFIX: tuple[str, ...] = tuple(
    sorted(_by_name, key=_staleness_key)[:GATE_SLOTS]
)

for _name in VERIFIED_PREFIX:
    register(*_by_name[_name])
# flagship lives outside the module REGISTRYs, so sweep _by_name (which
# includes it), not just the modules — a prefix without it must not drop it.
for _name, _fn, _oracle in _by_name.values():
    if _name not in QUERIES:
        register(_name, _fn, _oracle)
