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


def scd2_temporal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension join — enrich each event with the SCD2 customer
    version VALID AT the event's timestamp (the classic warehouse
    `valid_from <= ts < valid_to` band join; `streaming_static_enrich`
    joins the current version, this joins the historically correct one).
    The dimension history is version-bounded (per key at most a handful
    of rows), so Spark executes key-equality join + band filter — the
    right shape when the dim is millions of keys x few versions. Output:
    per (dimension version, event_type) event counts — integer-exact.
    """
    from pyspark.sql import functions as F

    from ..plans.etl_ops import customer_history

    tune(spark)
    history = customer_history(spark, sf_dir).where(F.col("c_custkey") <= 150)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", (F.col("user_id") + 1).alias("key")
    )
    joined = ev.join(
        F.broadcast(history),
        (F.col("key") == F.col("c_custkey"))
        & (F.col("valid_from") <= F.col("ts").cast("date"))
        & (
            F.col("valid_to").isNull()
            | (F.col("valid_to") > F.col("ts").cast("date"))
        ),
        "inner",
    )
    return (
        joined.groupBy(
            F.col("valid_from").cast("string").alias("version_from"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("key").alias("n_users"),
        )
    )


SCD2_TEMPORAL_ENRICH_ORACLE = """
WITH changed AS (
    SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 2 AND c_custkey % 7 = 0
), history AS (
    SELECT c_custkey, DATE '2024-01-01' AS valid_from,
           CASE WHEN c_custkey IN (SELECT c_custkey FROM changed)
                THEN DATE '2024-02-01' END AS valid_to
    FROM customer
    UNION ALL
    SELECT c_custkey, DATE '2024-02-01', CAST(NULL AS DATE)
    FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
), h AS (SELECT * FROM history WHERE c_custkey <= 150)
SELECT CAST(h.valid_from AS VARCHAR) AS version_from, e.event_type,
       count(*) AS n_events, count(DISTINCT e.user_id + 1) AS n_users
FROM events e JOIN h
  ON e.user_id + 1 = h.c_custkey
 AND h.valid_from <= CAST(e.ts AS DATE)
 AND (h.valid_to IS NULL OR h.valid_to > CAST(e.ts AS DATE))
GROUP BY 1, 2
"""


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution:each purchase credits the user's most recent
    PRIOR non-purchase event (last-touch). One per-user window with an
    IGNORE NULLS last() over the strictly-before frame — no self-join;
    credit totals per touch type. The canonical sessionized-attribution
    shape at any scale (window partitioned by user)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch_type"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


LAST_TOUCH_ORACLE = """
WITH t AS (
    SELECT event_type, user_id,
           last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
    FROM events
)
SELECT coalesce(touch, 'none') AS touch_type,
       count(*) AS n_purchases, count(DISTINCT user_id) AS n_users
FROM t WHERE event_type = 'purchase'
GROUP BY 1
"""


REGISTRY += [
    ("scd2_temporal_enrich", scd2_temporal_enrich, SCD2_TEMPORAL_ENRICH_ORACLE),
    ("last_touch_attribution", last_touch_attribution, LAST_TOUCH_ORACLE),
]
