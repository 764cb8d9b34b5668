"""Event-stream queries (batch form). The reference has no streaming
(SURVEY.md §2.10) — its incremental pattern is batch micro-snapshots — but
the engine ships the event-processing shapes a pipeline needs: time-bucket
rollups, JSON prop extraction, gap-based sessionization. The streaming
module (:mod:`..streaming.incremental`) reuses the same transformations
under Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources import materialize_result, read_table


def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation: one shuffle on (hour, event_type);
    partial aggregation runs map-side. This is the batch twin of the
    streaming windowed agg."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS hour_ts,
       event_type,
       count(*) AS n_events,
       cast(sum(cast(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def events_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: closed hourly buckets come
    from a materialized store, the open tail from raw events; the union
    must equal the full recompute (the oracle is the plain rollup minus the
    n_users column, which is not decomposable and stays query-time)."""
    import os
    import shutil
    import tempfile

    from ..operators.continuous_agg import (
        continuous_aggregate,
        materialize_closed_buckets,
    )

    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    with_epoch = ev.withColumn("_e", F.unix_timestamp("ts"))
    cut_epoch = with_epoch.approxQuantile("_e", [0.5], 0.0)[0]
    cutoff = F.date_trunc(
        "hour", F.to_timestamp(F.lit(int(cut_epoch)).cast("long"))
    )

    work = tempfile.mkdtemp(prefix="cont_agg_")
    path = os.path.join(work, "hourly")
    try:
        materialize_closed_buckets(ev, cutoff, path)
        out = continuous_aggregate(ev, cutoff, path)
        # re-stage under a stable path so the result outlives the tempdir
        # WITHOUT a driver round-trip (executors write, caller re-scans)
        return materialize_result(out, "events_continuous_aggregate")
    finally:
        shutil.rmtree(work, ignore_errors=True)


EVENTS_CONT_AGG_ORACLE = """
SELECT date_trunc('hour', ts) AS hour_ts,
       event_type,
       count(*) AS n_events,
       cast(sum(cast(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: get_json_object pushdown-friendly extraction
    (the reference ingests JSON REST payloads, FULL.py:147-156)."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


EVENTS_JSON_ORACLE = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle timeout): lag + running sum —
    the batch equivalent of a streaming session window. One shuffle on
    user_id; event_id breaks ordering ties deterministically.

    The gap compares exact integer MICROSECONDS (`unix_micros`, the
    timestamp's native precision): the fixture's timestamps are all
    sub-second, and the previously-used `unix_timestamp` TRUNCATES to
    seconds — a 1800.5 s true gap would read as 1800 and not split,
    while the streaming twin (and DuckDB's fractional `epoch`) would
    split. Integer micros make the batch query, the stateful streaming
    operator, and the oracle decide every boundary identically."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("is_new", new_session)
        .withColumn(
            "session_num",
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("event_id", "user_id", "ts", "session_num")
    )


EVENTS_SESSION_ORACLE = """
WITH g AS (
    SELECT event_id, user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, ts,
       CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS session_num
FROM g
"""


def events_gap_filled_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled (zero-filled) daily rollup: a calendar spine generated
    with sequence+explode from the observed [min, max] day, crossed with
    the distinct event types, left-joined to the aggregated facts, and
    missing buckets coalesced to zero. The spine is metadata-sized (days ×
    types), so both its build and the final join broadcast — the fact
    table still pays only its one aggregation shuffle. The high-value
    filter (value > 300) makes most buckets genuinely empty."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events").where(F.col("value") > 300)
    day = F.date_trunc("day", F.col("ts"))
    daily = ev.groupBy(day.alias("day_ts"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
    )
    bounds = ev.agg(
        F.min(day).alias("lo"), F.max(day).alias("hi")
    )
    spine_days = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day_ts")
    )
    types = ev.select("event_type").distinct()
    return (
        spine_days.crossJoin(types)
        .join(daily, ["day_ts", "event_type"], "left")
        .select(
            "day_ts",
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


EVENTS_GAP_FILLED_ORACLE = """
WITH f AS (SELECT * FROM events WHERE value > 300),
d AS (
  SELECT date_trunc('day', ts) AS day_ts, event_type,
         count(*) AS n_events,
         cast(sum(cast(value AS DECIMAL(27,6))) AS DOUBLE) AS total_value
  FROM f GROUP BY 1, 2
),
b AS (SELECT min(date_trunc('day', ts)) AS lo, max(date_trunc('day', ts)) AS hi FROM f),
s AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day_ts FROM b),
t AS (SELECT DISTINCT event_type FROM f)
SELECT s.day_ts, t.event_type,
       coalesce(d.n_events, 0) AS n_events,
       coalesce(d.total_value, 0.0) AS total_value
FROM s CROSS JOIN t
LEFT JOIN d ON d.day_ts = s.day_ts AND d.event_type = t.event_type
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted per
    whole-week offset from that day. Two shuffles, both on user_id-sized
    keys: the first-seen min-aggregate, then the (cohort, offset) distinct
    count. The first-seen table joins back as a broadcast at this scale;
    at 100 TB both sides are user-keyed, so pre-bucketing users makes the
    join co-located with zero extra exchange."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    first_seen = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    return (
        ev.select("user_id", day.alias("event_day"))
        .join(F.broadcast(first_seen), "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.datediff("event_day", "cohort_day") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


EVENTS_COHORT_ORACLE = """
WITH first_seen AS (
    SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
    FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(floor(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) / 7.0) AS INT)
           AS week_offset,
       count(DISTINCT e.user_id) AS n_active_users
FROM events e JOIN first_seen f USING (user_id)
GROUP BY 1, 2
"""


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase, strictly increasing
    timestamps): per-stage reach via per-user min-timestamp aggregates
    chained with broadcast joins — each stage's candidate set only
    shrinks, so every join after the first is against a smaller keyed
    aggregate, never a re-scan of raw events."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    viewed = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicked = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(viewed), "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchased = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(clicked), "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        viewed.agg(F.count("*").alias("n_viewed"))
        .crossJoin(clicked.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(purchased.agg(F.count("*").alias("n_purchased_after_click")))
    )
    return counts.select(
        "n_viewed",
        "n_clicked_after_view",
        "n_purchased_after_click",
        F.round(F.col("n_clicked_after_view") / F.col("n_viewed"), 6).alias(
            "view_to_click"
        ),
        F.round(
            F.col("n_purchased_after_click") / F.col("n_clicked_after_view"), 6
        ).alias("click_to_purchase"),
    )


EVENTS_FUNNEL_ORACLE = """
WITH viewed AS (
    SELECT user_id, min(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
), clicked AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN viewed v USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
), purchased AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN clicked c USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM viewed) AS n_viewed,
       (SELECT count(*) FROM clicked) AS n_clicked_after_view,
       (SELECT count(*) FROM purchased) AS n_purchased_after_click,
       round((SELECT count(*) FROM clicked) / (SELECT count(*) FROM viewed), 6)
           AS view_to_click,
       round((SELECT count(*) FROM purchased) / (SELECT count(*) FROM clicked), 6)
           AS click_to_purchase
"""


REGISTRY = [
    ("events_hourly_rollup", events_hourly_rollup, EVENTS_HOURLY_ORACLE),
    ("events_cohort_retention", events_cohort_retention, EVENTS_COHORT_ORACLE),
    ("events_funnel_conversion", events_funnel_conversion, EVENTS_FUNNEL_ORACLE),
    ("events_json_extract", events_json_extract, EVENTS_JSON_ORACLE),
    ("events_sessionization", events_sessionization, EVENTS_SESSION_ORACLE),
    ("events_continuous_aggregate", events_continuous_aggregate, EVENTS_CONT_AGG_ORACLE),
    ("events_gap_filled_rollup", events_gap_filled_rollup, EVENTS_GAP_FILLED_ORACLE),
]
