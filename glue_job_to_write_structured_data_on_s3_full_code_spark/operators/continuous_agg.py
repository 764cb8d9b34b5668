"""Continuous aggregate (hypertable-style rollup).

At 100 TB you never recompute an hourly rollup over all history per query:
closed time buckets are materialized once (idempotent partition overwrite,
same machinery as the snapshot sink) and only the open tail is aggregated
from raw events at query time. The query-time view is
``materialized ∪ rollup(raw tail)`` — exact, because buckets are disjoint
across the cutoff and each bucket is fully contained on one side.

This is the batch twin of the streaming watermark: the cutoff plays the
watermark's role (buckets before it are final), and re-materializing a
late-arriving bucket is a partition overwrite, not a rebuild.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The bucket aggregation both sides share. All aggregates are
    decomposable (sum/count/decimal-sum), so merged results are exact."""
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(27,6)")).cast("double").alias("total_value"),
    )


def materialize_closed_buckets(
    events: DataFrame, cutoff: Column, path: str
) -> None:
    """Materialize rollups for buckets strictly before ``cutoff`` (a bucket
    boundary). Partitioned by hour so late data re-materializes one
    partition."""
    closed = events.where(F.date_trunc("hour", F.col("ts")) < cutoff)
    hourly_rollup(closed).withColumn(
        "hour_part", F.date_format("hour_ts", "yyyyMMddHH")
    ).write.mode("overwrite").partitionBy("hour_part").parquet(path)


def continuous_aggregate(
    events: DataFrame, cutoff: Column, materialized_path: str
) -> DataFrame:
    """Full-range hourly rollup = materialized closed buckets ∪ tail
    aggregated from raw. Exact for decomposable aggregates."""
    spark = events.sparkSession
    materialized = spark.read.parquet(materialized_path).select(
        "hour_ts", "event_type", "n_events", "total_value"
    )
    tail = hourly_rollup(
        events.where(F.date_trunc("hour", F.col("ts")) >= cutoff)
    )
    return materialized.unionByName(tail)
