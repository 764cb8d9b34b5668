"""Temporal joins the reference lacks (SURVEY.md §2.4 "not present" list)
but a training-data/event pipeline needs: as-of join and time-range pair
join. Both are built to avoid join fanout at 100 TB.

- :func:`asof_join` — "latest right row at-or-before each left row" via
  the **union-merge** construction: union both sides tagged, one window
  sorted by (ts, side, tie) per key, ``last(value, ignorenulls=True)``
  carries the most recent right values forward. Cost: ONE shuffle on the
  key, zero join fanout — unlike the naive theta-join + top-1 which
  explodes to |L|×|R| per key. This is the merge-join formulation of
  as-of, expressed declaratively so Catalyst plans it as a single window.
- :func:`time_range_pairs` — same-key row pairs within ``window_sec`` of
  each other. The theta condition ``|tsₐ−tsᵦ| ≤ w`` is made an *equality*
  join by time-binning: each left row joins bins {b−1, b, b+1}, the right
  row its own bin, then the exact predicate filters and the normalized
  pair is deduplicated. Fanout is bounded by per-(key, bin) density, not
  by per-key row count².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """For every left row, attach ``value_cols`` of the right row with the
    greatest ``right_ts`` ≤ the left row's ``left_ts`` (ties on the
    timestamp broken by the greatest ``tie_col``). Left rows with no prior
    right row get nulls."""
    l_tagged = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_ts", F.col(left_ts)
    )
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"_v_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.col(tie_col).alias("_tie"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    l_cols = [c for c in left.columns]
    l_union = l_tagged.select(
        F.col(key),
        "_ts",
        "_is_left",
        F.col(tie_col).alias("_tie") if tie_col in left.columns else F.lit(None).cast("long").alias("_tie"),
        *[F.col(f"_v_{c}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    r_union = r_tagged
    for c in l_cols:
        r_union = r_union.withColumn(f"_l_{c}", F.lit(None).cast(left.schema[c].dataType))

    u = l_union.unionByName(r_union)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_left", "_tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_filled_{c}")
            for c in value_cols
        ],
    )
    return filled.where(F.col("_is_left") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        *[F.col(f"_filled_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def time_range_pairs(
    df: DataFrame,
    key: str,
    ts_col: str,
    id_col: str,
    window_sec: int,
) -> DataFrame:
    """Distinct pairs (id_a < id_b) of same-``key`` rows whose timestamps
    are within ``window_sec`` of each other, with the signed gap
    ``dt_sec = ts_b − ts_a``. All comparisons are exact integer
    microseconds, so the DuckDB oracle (epoch_us) agrees bit-for-bit."""
    us = F.unix_micros(F.col(ts_col))
    binned = df.select(
        F.col(key).alias("_k"),
        F.col(id_col).alias("_id"),
        us.alias("_ep"),
        F.floor(us / (window_sec * 1_000_000)).alias("_bin"),
    )
    a = binned.select(
        "_k",
        F.col("_id").alias("id_a"),
        F.col("_ep").alias("ep_a"),
        F.explode(
            F.array(F.col("_bin") - 1, F.col("_bin"), F.col("_bin") + 1)
        ).alias("_bin"),
    )
    b = binned.select(
        "_k", F.col("_id").alias("id_b"), F.col("_ep").alias("ep_b"), "_bin"
    )
    return (
        a.join(b, ["_k", "_bin"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("ep_b") - F.col("ep_a")) <= window_sec * 1_000_000)
        )
        .select(
            F.col("_k").alias(key),
            "id_a",
            "id_b",
            ((F.col("ep_b") - F.col("ep_a")) / 1_000_000.0).alias("dt_sec"),
        )
        .distinct()
    )
