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
from ..sources import read_table


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
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
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
    user_id; event_id breaks ordering ties deterministically."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
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
                     OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, ts,
       sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS session_num
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


REGISTRY = [
    ("events_hourly_rollup", events_hourly_rollup, EVENTS_HOURLY_ORACLE),
    ("events_json_extract", events_json_extract, EVENTS_JSON_ORACLE),
    ("events_sessionization", events_sessionization, EVENTS_SESSION_ORACLE),
    ("events_continuous_aggregate", events_continuous_aggregate, EVENTS_CONT_AGG_ORACLE),
    ("events_gap_filled_rollup", events_gap_filled_rollup, EVENTS_GAP_FILLED_ORACLE),
]
