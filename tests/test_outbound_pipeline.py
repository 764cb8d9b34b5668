"""End-to-end outbound job: incremental anti-join → document assembly →
partitioned write → reconcile — mirrors OUTBOUND.py's job lifecycle."""

from __future__ import annotations

import tempfile

from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.outbound import outbound_pipeline


def test_outbound_incremental_runs(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        # First run: everything is new, write + reconcile passes.
        summary1 = outbound_pipeline(spark, sf_dir, tmp, job_run_id="run1").collect()[0]
        assert summary1.reconciled
        assert summary1.src_count > 0

        # Second run over the same source: nothing new (pure incremental).
        summary2 = outbound_pipeline(spark, sf_dir, tmp, job_run_id="run2").collect()[0]
        assert summary2.reconciled
        assert summary2.src_count == 0


def test_bloom_join_type_safety_and_key_type_mismatch(spark, sf_dir):
    """(a) Non-inner join types must raise: a fact-side pre-filter
    deletes exactly the rows a left join would null-extend or an anti
    join would return. (b) An int-vs-bigint key type mismatch must not
    silently empty the join — xxhash64 hashes the input TYPE, so the
    probe now hashes a canonical string form on both sides."""
    import pytest
    from pyspark.sql import functions as F

    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.bloom import (
        bloom_prefiltered_join,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"), "l_quantity"
    )
    hi = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") >= 450000.0)
        .select(F.col("o_orderkey").cast("int").alias("o_orderkey"))
    )
    with pytest.raises(ValueError, match="unsound"):
        bloom_prefiltered_join(li, hi, "l_orderkey", "o_orderkey", how="left")
    with pytest.raises(ValueError, match="unsound"):
        bloom_prefiltered_join(li, hi, "l_orderkey", "o_orderkey", how="left_anti")
    got = bloom_prefiltered_join(li, hi, "l_orderkey", "o_orderkey").count()
    want = li.join(hi, li.l_orderkey == hi.o_orderkey).count()
    assert got == want > 0  # bigint fact key vs int dim key: identical
    # (c) CROSS-family mismatch (int vs double) must raise, not silently
    # drop rows: "1" vs "1.0" hash differently while the exact join
    # matches them under numeric coercion
    hi_dbl = hi.select(F.col("o_orderkey").cast("double").alias("o_orderkey"))
    with pytest.raises(ValueError, match="numeric families"):
        bloom_prefiltered_join(li, hi_dbl, "l_orderkey", "o_orderkey")
    # casting one side explicitly (the documented remedy) works and is
    # exact
    got_dbl = bloom_prefiltered_join(
        li.select(F.col("l_orderkey").cast("double").alias("l_orderkey")),
        hi_dbl,
        "l_orderkey",
        "o_orderkey",
    ).count()
    assert got_dbl == want


def test_reconcile_type_mismatch_returns_summary(spark):
    """Same column names but different types: raise_on_failure=False must
    return the inspection summary, not crash inside exceptAll."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.reconcile import (
        reconcile,
    )

    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(1, 2)], "k int, v int")
    row = reconcile(a, b, raise_on_failure=False).first()
    assert row.cols_match and not row.schema_match and not row.reconciled
    assert row.src_minus_tgt == -1 and row.tgt_minus_src == -1


def test_anti_join_drops_null_keyed_source_rows(spark):
    """Reference NOT-IN parity: NULL NOT IN (…) is NULL → dropped. A bare
    left_anti kept NULL-keyed rows as always-new, so every incremental
    run re-inserted them — duplicates accumulating silently."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.incremental import (
        anti_join_new_rows,
    )

    src = spark.createDataFrame([(1, "a"), (None, "b")], "k int, v string")
    tgt = spark.createDataFrame([(9, "z")], "k int, v string")
    got = anti_join_new_rows(src, tgt, "k").collect()
    assert [(r.k, r.v) for r in got] == [(1, "a")]
    # idempotence: a second run over a target now containing row 1 and a
    # NULL-keyed row inserts nothing
    tgt2 = spark.createDataFrame([(1, "a"), (None, "b")], "k int, v string")
    assert anti_join_new_rows(src, tgt2, "k").count() == 0
