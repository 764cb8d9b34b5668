"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full computation, no
collect/serialize-to-driver cost — what a cluster job would do writing
parquet, minus the object store).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


# Headline set: the reference-shaped pipeline, the heavy relational shapes,
# and the LLM-scale operators. Names must exist in the registry.
BENCH_QUERIES = [
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from glue_job_to_write_structured_data_on_s3_full_code_spark.session import get_spark
    from glue_job_to_write_structured_data_on_s3_full_code_spark.registry import QUERIES

    spark = get_spark("bench")
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm (JIT/broadcast)
        # min of 2 timed runs: single-run numbers swing with background
        # load; the min is the stable estimate of the plan's true cost
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
