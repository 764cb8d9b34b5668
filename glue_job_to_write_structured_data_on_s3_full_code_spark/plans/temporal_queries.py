"""Temporal-join queries over the events table (operators/temporal.py).

- ``events_asof_last_purchase``: for every event, the user's most recent
  'purchase' event at-or-before it — the as-of join via union-merge (one
  shuffle, no fanout). The oracle mirrors the same construction with
  IGNORE NULLS window fill, so tie semantics are pinned identically.
- ``events_range_pairs``: same-user event pairs within 120 s — the
  bin-bucketed range join; oracle is the plain theta self-join (exact at
  fixture scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, time_range_pairs
from ..session import tune
from ..sources import read_table


def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    purchases = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    out = asof_join(
        ev,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_id", "purchase_value"],
        tie_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_purchase_id").alias("last_purchase_id"),
        F.round("asof_purchase_value", 6).alias("last_purchase_value"),
    )


ASOF_ORACLE = """
WITH u AS (
    SELECT user_id, ts, 1 AS is_left, event_id AS tie, event_id,
           CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS DOUBLE) AS purchase_value
    FROM events
    UNION ALL
    SELECT user_id, ts, 0 AS is_left, event_id AS tie, CAST(NULL AS BIGINT),
           event_id, value
    FROM events WHERE event_type = 'purchase'
),
filled AS (
    SELECT *,
           last_value(purchase_id IGNORE NULLS) OVER w AS last_purchase_id,
           last_value(purchase_value IGNORE NULLS) OVER w AS last_purchase_value
    FROM u
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, is_left, tie
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
)
SELECT event_id, user_id, ts, last_purchase_id,
       round(last_purchase_value, 6) AS last_purchase_value
FROM filled WHERE is_left = 1
"""


def events_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    return time_range_pairs(
        ev, key="user_id", ts_col="ts", id_col="event_id", window_sec=120
    )


RANGE_PAIRS_ORACLE = """
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
       (epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0 AS dt_sec
FROM events a
JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 120 * 1000000
"""


REGISTRY = [
    ("events_asof_last_purchase", events_asof_last_purchase, ASOF_ORACLE),
    ("events_range_pairs", events_range_pairs, RANGE_PAIRS_ORACLE),
]
