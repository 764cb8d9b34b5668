"""MERGE (upsert) between snapshots — the engine-level primitive the
reference approximates with anti-join + insert (OUTBOUND.py:206-224 only
ever INSERTS missing leads; true upsert also replaces matched rows).

Two physical shapes, both one-shuffle-per-side on the merge key:

- :func:`merge_upsert` — MERGE … WHEN MATCHED THEN UPDATE SET * /
  WHEN NOT MATCHED THEN INSERT *: implemented as target-anti-join ∪
  source ("replace matched, insert new"). The anti join is the only work
  over the (big) target; the source is usually the small delta and can
  broadcast.
- :func:`merge_upsert_columns` — WHEN MATCHED THEN UPDATE SET only the
  given columns (other target columns survive): full-outer join +
  per-column coalesce. Costs a full-outer shuffle; use when the update
  touches a column subset and the target row must otherwise be kept.

At 100 TB the companion trick is partition pruning: merge only the
target partitions the delta touches (snapshot model, SURVEY §1.1) —
both functions take pre-filtered frames, so the caller prunes first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Rows of ``source`` replace same-key rows of ``target``; target rows
    without a source match survive. Schemas must align by name."""
    assert set(target.columns) == set(source.columns), (
        "merge_upsert: schemas must match by name; got "
        f"{sorted(set(target.columns) ^ set(source.columns))} unmatched"
    )
    # no broadcast hint: the delta is usually small enough that AQE picks
    # a broadcast anti join on its own, but a backfill-sized source must
    # be allowed to shuffle
    kept = target.join(source.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(source)


def merge_upsert_columns(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str],
) -> DataFrame:
    """Column-subset MERGE: matched rows take ``update_cols`` from the
    source and keep every other column from the target; unmatched source
    rows insert (non-updated columns null); unmatched target rows
    survive unchanged."""
    t = target.alias("t")
    s = source.select(*key_cols, *update_cols).alias("s")
    joined = t.join(s, key_cols, "full_outer")
    out_cols = []
    for c in target.columns:
        if c in key_cols:
            # full_outer on the key list coalesces the key automatically
            out_cols.append(F.col(c))
        elif c in update_cols:
            out_cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)
