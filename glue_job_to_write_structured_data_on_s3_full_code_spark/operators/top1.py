"""Window top-1-per-group dedup (reference operators W2/J5, SURVEY.md §2.6).

The reference wraps every waterfall join in
``row_number() over (partition by leadid order by sallivedate desc) rn …
where rn = 1`` (FULL.py:744-757 and 7 siblings) to keep the newest match
per lead. This is a single hash-shuffle on the group key; at 100 TB the
only hazards are key skew (AQE skew handling is enabled in session.tune)
and nondeterministic ties — callers must pass a unique tiebreaker
(SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column | str],
) -> DataFrame:
    """Keep the first row per group under ``order_cols`` (include a unique
    key as the last order column for determinism)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
