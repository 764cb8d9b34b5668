"""Import-time consistency between bench.py and the registry: a typo'd
bench name would otherwise only fail inside the driver's bench run."""

from __future__ import annotations


#: The ORIGINAL r1-r3 bench set — the denominator of every cross-round
#: `baseline_comparable_total` since round 1 and of the 2× contract vs the
#: r1 recording. FROZEN: a bench query added to BENCH_QUERIES without a
#: matching bench.GROWN entry would silently inflate the comparable total
#: (this happened mid-round-8, SCALE.md:372-375), so membership is pinned
#: here and any drift fails at test time, not at judge time.
COMPARABLE_23 = frozenset(
    {
        "flagship_prospect_pipeline",
        "pricing_summary_agg",
        "regional_revenue_join",
        "top_unshipped_orders",
        "window_top1_per_group",
        "waterfall_fallback_join",
        "nested_document_json",
        "anti_join_incremental",
        "dedup_exact",
        "dedup_jaccard_pairs",
        "minhash_lsh_dedup",
        "simhash_fingerprint",
        "embedding_cosine_topk",
        "token_count_bpe",
        "document_chunking",
        "corpus_curation_pipeline",
        "events_sessionization",
        "events_hourly_rollup",
        "events_asof_last_purchase",
        "events_range_pairs",
        "stats_agg_suite",
        "cube_subtotals",
        "embedding_neardup_dedup",
    }
)


def test_bench_queries_resolve():
    import bench

    from glue_job_to_write_structured_data_on_s3_full_code_spark.registry import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, f"bench names not in registry: {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_comparable_set_frozen():
    """set(BENCH_QUERIES) − GROWN must equal the original 23 exactly: a new
    bench query belongs in GROWN, and a GROWN entry must name a live bench
    query (a stale entry would mask a future accidental removal)."""
    import bench

    assert len(COMPARABLE_23) == 23
    comparable = set(bench.BENCH_QUERIES) - bench.GROWN
    assert comparable == COMPARABLE_23, (
        f"comparable bench set drifted: extra={sorted(comparable - COMPARABLE_23)} "
        f"missing={sorted(COMPARABLE_23 - comparable)} — new BENCH_QUERIES "
        "entries must be added to bench.GROWN"
    )
    stale = bench.GROWN - set(bench.BENCH_QUERIES)
    assert not stale, f"bench.GROWN names absent from BENCH_QUERIES: {sorted(stale)}"
