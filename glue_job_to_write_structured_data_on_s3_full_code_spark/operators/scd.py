"""Slowly-changing-dimension (Type 2) merge — the dimension-history
operator the reference's snapshot model implies but never materializes:
FULL.py re-derives the whole structured table from each day's snapshot
(FULL.py:72, dataset_date partition) and OUTBOUND.py anti-joins to find
new rows (OUTBOUND.py:206-224); SCD2 is the standard warehouse evolution
of that pattern, keeping every historical version with validity windows.

Plan shape: one equi-join of current-vs-update on the business key plus
unions — no window functions, no correlated logic, so at 100 TB the cost
is a single key shuffle (or zero with bucketed storage on the key).
Change detection hashes the compared columns (md5 of a canonical concat)
rather than comparing N columns pairwise, so the join projects 2 narrow
hash columns instead of 2×N payload columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_hash(cols: list[str]) -> Column:
    """Canonical md5 over the compared columns: md5 of the concatenated
    PER-COLUMN md5s. Hash-of-hashes, not delimiter-joined values — the
    inner digests are fixed-width, so no value can collide across column
    boundaries (a plain separator join makes ('a\\x1fb','c') and
    ('a','b\\x1fc') equal, silently missing a real change). NULL hashes
    to a distinct constant so (NULL) and ('') differ."""
    parts = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("0" * 32))
        for c in cols
    ]
    return F.md5(F.concat(*parts))


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    compare_cols: list[str],
    load_date: str,
    open_date_col: str = "valid_from",
    close_date_col: str = "valid_to",
) -> DataFrame:
    """Merge an update snapshot into an SCD2 history table.

    ``current`` carries the history: business columns + ``valid_from`` +
    ``valid_to`` (NULL = open version). ``updates`` carries the new
    snapshot's business columns only. Semantics per business key:

    - changed (hash differs from the open version): close the old row at
      ``load_date``, append the new version opening at ``load_date``;
    - unchanged: carried through untouched;
    - new key: appended, opening at ``load_date``;
    - key absent from updates: carried through (no implicit deletes —
      deletion policy is the caller's, matching the reference's
      insert-only DocumentDB load, OUTBOUND.py:206-224).

    Closed historical rows (``valid_to`` not NULL) never join — they are
    filtered out of the comparison and unioned back, so reruns are
    idempotent: re-merging the same snapshot is a no-op.

    Business columns OUTSIDE ``compare_cols`` are carried through, not
    compared (type-0 payload alongside the type-2 history): a changed
    row's new version takes them from the update snapshot, the
    closed-out version keeps the historical values, and a change in
    ONLY a carried column neither opens a new version nor rewrites the
    open one. The update snapshot must carry every business column of
    ``current``.
    """
    biz_cols = [
        c for c in current.columns if c not in (open_date_col, close_date_col)
    ]
    missing = [c for c in biz_cols if c not in updates.columns]
    assert not missing, (
        f"scd2_merge: updates snapshot lacks business columns {missing}"
    )
    hash_cols = [key, *compare_cols]
    closed = current.where(F.col(close_date_col).isNotNull())
    open_cur = current.where(F.col(close_date_col).isNull())

    upd = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in biz_cols],
        row_hash(hash_cols).alias("_u_hash"),
    )
    cur = open_cur.withColumn("_c_hash", row_hash(hash_cols))
    j = cur.join(upd, cur[key] == F.col(f"_u_{key}"), "full_outer")

    unchanged = j.where(
        F.col("_c_hash").isNotNull()
        & (F.col("_u_hash").isNull() | (F.col("_u_hash") == F.col("_c_hash")))
    ).select(*current.columns)

    closed_out = j.where(
        F.col("_c_hash").isNotNull()
        & F.col("_u_hash").isNotNull()
        & (F.col("_u_hash") != F.col("_c_hash"))
    ).select(
        *[F.col(c) for c in biz_cols],
        F.col(open_date_col),
        F.lit(load_date).cast("date").alias(close_date_col),
    )

    new_versions = j.where(
        F.col("_u_hash").isNotNull()
        & (F.col("_c_hash").isNull() | (F.col("_u_hash") != F.col("_c_hash")))
    ).select(
        *[F.col(f"_u_{c}").alias(c) for c in biz_cols],
        F.lit(load_date).cast("date").alias(open_date_col),
        F.lit(None).cast("date").alias(close_date_col),
    )

    return (
        closed.select(*current.columns)
        .unionByName(unchanged)
        .unionByName(closed_out)
        .unionByName(new_versions)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two snapshots of the same table: full-outer join
    on the key comparing content hashes → status ∈ {added, removed,
    changed}. Unchanged rows are dropped (at 100 TB they are ~all rows —
    never materialize them). The reference's bidirectional MINUS
    reconciliation (OUTBOUND.py:422-449) is this with statuses collapsed
    to counts."""
    o = old.select(
        F.col(key).alias("_o_key"), row_hash([key, *compare_cols]).alias("_o_hash")
    )
    n = new.select(
        F.col(key).alias("_n_key"), row_hash([key, *compare_cols]).alias("_n_hash")
    )
    j = o.join(n, F.col("_o_key") == F.col("_n_key"), "full_outer")
    return (
        j.select(
            F.coalesce(F.col("_n_key"), F.col("_o_key")).alias(key),
            F.when(F.col("_o_key").isNull(), "added")
            .when(F.col("_n_key").isNull(), "removed")
            .when(F.col("_o_hash") != F.col("_n_hash"), "changed")
            .alias("status"),
        )
        .where(F.col("status").isNotNull())
    )
