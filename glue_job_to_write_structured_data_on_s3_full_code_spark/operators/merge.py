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
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    validate_unique_source: bool = False,
) -> DataFrame:
    """Rows of ``source`` replace same-key rows of ``target``; target rows
    without a source match survive. Schemas must align by name.

    The source must be key-unique — SQL MERGE raises on multiple source
    matches, and a duplicated delta here would land BOTH rows in the
    output (every downstream key-unique consumer then sees corrupt
    state, silently). The default trusts the caller's CDC dedup;
    ``validate_unique_source=True`` enforces it in-plan (a count window
    over the source + per-row assert — one extra shuffle of the
    delta-sized source, none of the big target)."""
    assert set(target.columns) == set(source.columns), (
        "merge_upsert: schemas must match by name; got "
        f"{sorted(set(target.columns) ^ set(source.columns))} unmatched"
    )
    if validate_unique_source:
        from pyspark.sql import Window

        # assert folded into a filter (assert_true yields NULL on pass →
        # isNull() is a tautological predicate) so column pruning cannot
        # eliminate it — same pattern as lsh_bucketed_topk's dim check
        n = F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
        source = (
            source.withColumn("_kn", n)
            .where(
                F.assert_true(
                    F.col("_kn") == 1,
                    F.lit(
                        "merge_upsert: duplicate source keys — SQL MERGE "
                        "semantics require a key-unique source"
                    ),
                ).isNull()
            )
            .drop("_kn")
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
    survive unchanged.

    Matched rows take the source value EVEN WHEN IT IS NULL — the
    ``UPDATE SET c = s.c`` semantics of SQL MERGE ("clear the amount" is
    a legitimate update). A per-column coalesce cannot express that (it
    reads a NULL update as "no match"), so matching is decided by an
    explicit indicator column instead."""
    t = target.alias("t")
    s = source.select(
        *key_cols, *update_cols, F.lit(True).alias("_matched")
    ).alias("s")
    joined = t.join(s, key_cols, "full_outer")
    out_cols = []
    for c in target.columns:
        if c in key_cols:
            # full_outer on the key list coalesces the key automatically
            out_cols.append(F.col(c))
        elif c in update_cols:
            out_cols.append(
                F.when(F.col("s._matched").isNotNull(), F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)
