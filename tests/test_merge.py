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
