"""Query + oracle registry — the driver-facing coverage inventory.

Every implemented operator from SURVEY.md §2 registers here as
``(name, callable(spark, sf_dir) -> DataFrame, oracle_sql | None)``.
``__spark_entry__.queries()`` / ``oracle_sql()`` read from this module.

Registration ORDER is deliberate: the driver's correctness gate verifies a
bounded prefix of the registry (round 1 recorded exactly the first 50
entries), so the flagship, the LLM-data-pipeline operators (first-class per
the north star), events/temporal/streaming, and the core reference-parity
relational operators register first; wide function-suite breadth queries
(all still verified locally by tests/test_oracle_parity.py) come last.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans.flagship import FLAGSHIP_ORACLE, flagship
from .plans import (
    breadth,
    breadth2,
    deep_pipeline,
    engine_ops,
    etl_ops,
    events_queries,
    graph_queries,
    linkage,
    llm_ops,
    llm_ops2,
    llm_ops3,
    llm_ops4,
    outbound,
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


# The driver's correctness gate verifies a bounded prefix of this registry
# (each round records exactly the first 50 entries), so the prefix ROTATES
# per round to keep every registered query driver-verified recently:
# round 1 covered the flagship + relational/function breadth, round 2 the
# LLM/events/streaming families. Round 3's prefix is every query neither
# round saw (43), the three rows round 2 marked red/weak and this round
# fixed (minhash_lsh_dedup oracle, both sessionizations' oracle typing),
# the new reference-depth pipeline, and three of the oldest round-1 names.
# Everything rotated out remains verified locally by
# tests/test_oracle_parity.py (all registered queries, every session).
# Queries ADDED during round 3 (IVFADC, perplexity filter, leakage check,
# pretraining pipeline, the four new streaming rows, salted join, audio
# energy, CMS) register after slot 50 and rotate through the gate in
# round 4.
_VERIFIED_PREFIX = (
    # fixed since round 2's gate: md5 Carter-Wegman MinHash oracle,
    # BIGINT-cast sessionization oracle (events + streaming share it)
    "minhash_lsh_dedup",
    "events_sessionization",
    "streaming_sessionization",
    # new this round: the ~18-stage reference-depth pipeline
    "deep_prospect_pipeline",
    # never driver-verified before this round — ANN + multimodal + text
    "embedding_ivf_topk",
    "embedding_pq_topk",
    "embedding_lsh_topk",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "language_id_heuristic",
    "document_fingerprint",
    "pii_redaction",
    "html_strip",
    "weighted_source_mix",
    "dedup_components",
    "repetition_ratio_filter",
    "quality_percentile_gate",
    "bigram_lm_probs",
    "stratified_sample",
    "stopword_discovery",
    "consonant_skeleton_blocking",
    # never driver-verified — events/temporal/engine
    "events_json_extract",
    "events_continuous_aggregate",
    "events_gap_filled_rollup",
    "merge_update_columns_orders",
    "deterministic_mode",
    # never driver-verified — relational/TPC-H breadth
    "order_count_distribution",
    "idle_customer_balance",
    "range_frame_rolling_spend",
    "json_function_suite",
    "agg_breadth2_suite",
    "quantity_histogram",
    "revenue_forecast_filter_agg",
    "product_type_profit",
    "returned_item_ranking",
    "shipping_delay_buckets",
    "promo_revenue_share",
    "top_supplier_revenue",
    "small_quantity_revenue",
    "large_volume_customers",
    "disjunctive_bracket_join",
    "lonely_late_suppliers",
    "part_supplier_breadth",
    "local_supplier_volume",
    "important_part_values",
    "heavy_part_suppliers",
    "value_window_suite",
    # oldest round-1 names rotated back through the gate
    "top_unshipped_orders",
    "nation_pair_volume",
    "stats_agg_suite",
)

_ALL_MODULES = (
    deep_pipeline, llm_ops, llm_ops2, llm_ops3, llm_ops4, linkage, events_queries,
    temporal_queries, timeseries_queries, streaming_queries, graph_queries,
    waterfall, outbound, etl_ops, engine_ops, relational, breadth, breadth2,
    tpch_more,
)

_by_name = {"flagship_prospect_pipeline": ("flagship_prospect_pipeline", flagship, FLAGSHIP_ORACLE)}
for _module in _ALL_MODULES:
    for _entry in _module.REGISTRY:
        _by_name[_entry[0]] = _entry

assert len(_VERIFIED_PREFIX) == 50 and len(set(_VERIFIED_PREFIX)) == 50
for _name in _VERIFIED_PREFIX:
    register(*_by_name[_name])
# flagship lives outside the module REGISTRYs, so sweep _by_name (which
# includes it), not just the modules — a prefix without it must not drop it.
for _name, _fn, _oracle in _by_name.values():
    if _name not in QUERIES:
        register(_name, _fn, _oracle)
