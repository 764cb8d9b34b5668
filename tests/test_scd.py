"""SCD Type-2 merge semantics: idempotency, history preservation, and
no-implicit-delete policy (operators/scd.py)."""

from __future__ import annotations

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
