"""Physical-plan regression gate: the properties SCALE.md claims must stay
true as queries evolve — pushdown reaching the scan, dims broadcast (no
sort-merge on the enrichment path), bounded exchange counts."""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_filter_pushdown_reaches_scan(spark, sf_dir, queries):
    plan = _plan(queries["filter_pushdown_scan"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    # every predicate pushed: no residual Filter-only exchange stage
    assert plan.count("Exchange") == 0
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and all("[]" not in l for l in pushed)


def test_flagship_broadcasts_all_dims(spark, sf_dir, queries):
    plan = _plan(queries["flagship_prospect_pipeline"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_pricing_summary_single_agg_exchange(spark, sf_dir, queries):
    # partial → final hash aggregation: one shuffle for the agg (AQE may
    # append a read-stage wrapper, so bound it rather than pin it)
    plan = _plan(queries["pricing_summary_agg"](spark, sf_dir))
    assert "HashAggregate" in plan
    assert plan.count("Exchange") <= 2


def test_scan_prunes_columns(spark, sf_dir, queries):
    plan = _plan(queries["pricing_summary_agg"](spark, sf_dir))
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read
    # lineitem has 16 columns; the query needs 7
    assert all(l.count(":") - 1 <= 8 for l in read), read


def test_anti_join_is_anti_not_except(spark, sf_dir, queries):
    plan = _plan(queries["anti_join_incremental"](spark, sf_dir))
    assert "LeftAnti" in plan


def test_window_top1_partitions_by_group_key(spark, sf_dir, queries):
    # no global (empty-partition) window in the scale path
    df = queries["window_top1_per_group"](spark, sf_dir)
    plan = _plan(df)
    assert "Window" in plan
    assert "WindowExec: No Partition Defined" not in plan


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, queries, tmp_path):
    """Bucketing both sides of a join on the join key pre-shuffles the data
    at write time — the SCALE.md co-location claim. The joined plan must
    contain no Exchange (and bucketed scans on both sides)."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
        read_table(spark, sf_dir, "orders").write.bucketBy(8, "o_custkey").sortBy(
            "o_custkey"
        ).mode("overwrite").saveAsTable("b_orders")
        read_table(spark, sf_dir, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        ).write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode(
            "overwrite"
        ).saveAsTable("b_customer")

        joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually computes
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
