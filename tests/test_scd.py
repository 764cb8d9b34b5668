"""SCD Type-2 merge semantics: idempotency, history preservation, and
no-implicit-delete policy (operators/scd.py)."""

from __future__ import annotations

import pytest

import datetime

from pyspark.sql import functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.scd import scd2_merge, snapshot_diff


def _history(spark):
    rows = [
        # key 1: already has a closed v1 and an open v2
        (1, "alice", 10.0, datetime.date(2023, 1, 1), datetime.date(2023, 6, 1)),
        (1, "alice", 20.0, datetime.date(2023, 6, 1), None),
        # key 2: single open version
        (2, "bob", 5.0, datetime.date(2023, 1, 1), None),
        # key 3: single open version, absent from the update snapshot
        (3, "carol", 7.0, datetime.date(2023, 1, 1), None),
    ]
    return spark.createDataFrame(
        rows, "k int, name string, bal double, valid_from date, valid_to date"
    )


def _updates(spark):
    rows = [
        (1, "alice", 30.0),   # changed balance
        (2, "bob", 5.0),      # unchanged
        (4, "dave", 1.0),     # new key
    ]
    return spark.createDataFrame(rows, "k int, name string, bal double")


def test_scd2_merge_branches(spark):
    out = scd2_merge(
        _history(spark), _updates(spark), "k", ["name", "bal"], "2024-01-01"
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)

    # key 1: closed v1 untouched, v2 now closed at load date, v3 open
    k1 = sorted(by_key[1], key=lambda r: r.valid_from)
    assert len(k1) == 3
    assert k1[0].valid_to == datetime.date(2023, 6, 1)
    assert k1[1].bal == 20.0 and k1[1].valid_to == datetime.date(2024, 1, 1)
    assert k1[2].bal == 30.0 and k1[2].valid_to is None
    # key 2 unchanged: exactly the original open row
    assert len(by_key[2]) == 1 and by_key[2][0].valid_to is None
    # key 3 absent from updates: carried, still open (no implicit delete)
    assert len(by_key[3]) == 1 and by_key[3][0].valid_to is None
    # key 4: new, open at load date
    assert len(by_key[4]) == 1
    assert by_key[4][0].valid_from == datetime.date(2024, 1, 1)
    assert by_key[4][0].valid_to is None


@pytest.mark.slow  # runs the merge twice for idempotency (~8 s)
def test_scd2_merge_idempotent(spark):
    merged = scd2_merge(
        _history(spark), _updates(spark), "k", ["name", "bal"], "2024-01-01"
    )
    again = scd2_merge(
        merged, _updates(spark), "k", ["name", "bal"], "2024-02-01"
    )
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b  # re-merging the same snapshot is a no-op


def test_snapshot_diff_drops_unchanged(spark):
    old = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], "k int, v double")
    new = spark.createDataFrame([(2, 2.0), (3, 9.0), (4, 4.0)], "k int, v double")
    got = {(r.k, r.status) for r in snapshot_diff(old, new, "k", ["v"]).collect()}
    assert got == {(1, "removed"), (3, "changed"), (4, "added")}


def test_row_hash_no_cross_column_collisions(spark):
    """Hash-of-hashes: values containing the old join separator must not
    collide across column boundaries — ('a\\x1fb','c') vs ('a','b\\x1fc')
    previously hashed equal and scd2 silently missed the change."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.scd import row_hash

    df = spark.createDataFrame(
        [("a\x1fb", "c"), ("a", "b\x1fc"), (None, "x"), ("", "x")],
        "c1 string, c2 string",
    )
    hashes = [r.h for r in df.select(row_hash(["c1", "c2"]).alias("h")).collect()]
    assert len(set(hashes)) == 4  # all four rows distinct


def test_scd2_merge_carries_non_compared_columns(spark):
    """A business column outside compare_cols is carried through (type-0
    payload): previously its mere presence crashed the closing union."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.scd import scd2_merge

    current = spark.createDataFrame(
        [(1, "alice", 100.0, "addr-1", "2023-01-01", None),
         (2, "bob", 50.0, "addr-2", "2023-01-01", None)],
        "id int, name string, bal double, address string, "
        "valid_from string, valid_to string",
    ).selectExpr(
        "id", "name", "bal", "address",
        "CAST(valid_from AS DATE) AS valid_from",
        "CAST(valid_to AS DATE) AS valid_to",
    )
    updates = spark.createDataFrame(
        [(1, "alice", 175.0, "addr-1-new"),   # bal changed -> new version
         (2, "bob", 50.0, "addr-2-new")],     # only carried col changed -> no-op
        "id int, name string, bal double, address string",
    )
    out = scd2_merge(current, updates, "id", ["name", "bal"], "2023-06-01")
    rows = {(r.id, str(r.valid_from), r.valid_to and str(r.valid_to)): r
            for r in out.collect()}
    # id=1: closed-out keeps the HISTORICAL address; new version takes the new one
    closed = rows[(1, "2023-01-01", "2023-06-01")]
    assert closed.address == "addr-1" and closed.bal == 100.0
    opened = rows[(1, "2023-06-01", None)]
    assert opened.address == "addr-1-new" and opened.bal == 175.0
    # id=2: carried-only change neither opens a version nor rewrites
    assert rows[(2, "2023-01-01", None)].address == "addr-2"
    assert len(rows) == 3
