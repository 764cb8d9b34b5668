"""MERGE-upsert semantics pinned on hand-built frames."""

from __future__ import annotations

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.merge import (
    merge_upsert,
    merge_upsert_columns,
)


def _frames(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, status string, amount double",
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)],
        "k long, status string, amount double",
    )
    return target, source


def test_merge_upsert_replaces_inserts_keeps(spark):
    target, source = _frames(spark)
    got = {r.k: (r.status, r.amount) for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {
        1: ("a", 10.0),   # untouched target row survives
        2: ("B", 99.0),   # matched row fully replaced
        3: ("c", 30.0),
        4: ("d", 40.0),   # new key inserted
    }


def test_merge_upsert_rejects_schema_mismatch(spark):
    target, source = _frames(spark)
    import pytest

    with pytest.raises(AssertionError):
        merge_upsert(target, source.drop("amount"), ["k"])


def test_merge_upsert_columns_partial_update(spark):
    target, source = _frames(spark)
    got = {
        r.k: (r.status, r.amount)
        for r in merge_upsert_columns(target, source, ["k"], ["amount"]).collect()
    }
    assert got[2] == ("b", 99.0)      # amount updated, status kept from target
    assert got[1] == ("a", 10.0)
    assert got[4] == (None, 40.0)     # insert: non-updated column null


def test_merge_upsert_columns_null_update_applies(spark):
    """UPDATE SET c = s.c writes NULL — 'clear the amount' is a real
    update. The previous per-column coalesce read a NULL update as 'no
    match' and silently kept the stale target value."""
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k int, status string, amount double"
    )
    source = spark.createDataFrame(
        [(2, None)], "k int, amount double"
    )
    got = {
        r.k: (r.status, r.amount)
        for r in merge_upsert_columns(target, source, ["k"], ["amount"]).collect()
    }
    assert got[2] == ("b", None)  # matched: amount cleared, status kept
    assert got[1] == ("a", 10.0)  # unmatched target untouched


def test_merge_upsert_validate_unique_source_raises(spark):
    """SQL MERGE errors on multiple source matches; the opt-in guard
    turns a duplicated delta into a raise instead of silently landing
    both rows."""
    import pytest

    target = spark.createDataFrame([(1, "a")], "k int, v string")
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "k int, v string")
    with pytest.raises(Exception, match="duplicate source keys"):
        merge_upsert(target, dup, ["k"], validate_unique_source=True).collect()
    # unique source passes through the guard unchanged
    ok = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    got = {
        r.k: r.v
        for r in merge_upsert(
            target, ok, ["k"], validate_unique_source=True
        ).collect()
    }
    assert got == {1: "x", 2: "y"}
