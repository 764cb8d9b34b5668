"""Error bounds for the sketch aggregates: HLL distinct counts within the
documented ~5% relative standard deviation (asserted at 15% for slack) and
approximate percentiles inside the true value range with rank accuracy
implied by the accuracy parameter."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.relational import (
    approx_distinct_raw,
)
from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table


def test_hll_within_error_bound(spark, sf_dir):
    approx = {
        r.l_returnflag: (r.approx_orders, r.approx_suppliers)
        for r in approx_distinct_raw(spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: (r.orders, r.suppliers)
        for r in read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_suppkey").alias("suppliers"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for flag, (ao, asup) in approx.items():
        eo, esup = exact[flag]
        assert abs(ao - eo) / eo <= 0.15, (flag, ao, eo)
        assert abs(asup - esup) / esup <= 0.15, (flag, asup, esup)


def test_percentiles_ordered_and_in_range(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    bounds = {
        r.l_returnflag: (r.lo, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for r in approx_distinct_raw(spark, sf_dir).collect():
        lo, hi = bounds[r.l_returnflag]
        assert lo <= r.p50_price <= r.p99_price <= hi


def test_gate_variant_bounds_all_true(spark, sf_dir):
    """The oracle-checkable registered variant must report every sketch
    inside its bound (the DuckDB oracle pins these TRUE)."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.relational import (
        approx_distinct_stats,
    )

    for r in approx_distinct_stats(spark, sf_dir).collect():
        assert r.orders_in_bound and r.suppliers_in_bound, r
        assert r.p50_in_band and r.p99_in_band, r
