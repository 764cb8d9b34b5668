"""Query + oracle registry — the driver-facing coverage inventory.

Every implemented operator from SURVEY.md §2 registers here as
``(name, callable(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
``__spark_entry__.queries()`` / ``oracle_sql()`` read from this module.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans.flagship import FLAGSHIP_ORACLE, flagship
from .plans import (
    breadth,
    events_queries,
    llm_ops,
    llm_ops2,
    outbound,
    relational,
    streaming_queries,
    temporal_queries,
    waterfall,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


register("flagship_prospect_pipeline", flagship, FLAGSHIP_ORACLE)
for _module in (
    breadth,
    relational,
    waterfall,
    outbound,
    llm_ops,
    llm_ops2,
    events_queries,
    streaming_queries,
    temporal_queries,
):
    for _name, _fn, _oracle in _module.REGISTRY:
        register(_name, _fn, _oracle)
