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


REGISTRY = [
    ("events_hourly_rollup", events_hourly_rollup, EVENTS_HOURLY_ORACLE),
    ("events_json_extract", events_json_extract, EVENTS_JSON_ORACLE),
    ("events_sessionization", events_sessionization, EVENTS_SESSION_ORACLE),
    ("events_continuous_aggregate", events_continuous_aggregate, EVENTS_CONT_AGG_ORACLE),
]
