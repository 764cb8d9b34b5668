"""Structured Streaming wrappers.

The reference has NO streaming (SURVEY.md §2.10) — its incremental pattern
is batch micro-snapshots: new snapshot partition per run, anti-join against
the target, idempotent partition overwrite. These wrappers are the
streaming twins of that pattern, so the same transforms run in either mode:

- :func:`stream_incremental_load` — file-source ``readStream`` →
  user transform → ``foreachBatch`` anti-join append: exactly the
  OUTBOUND.py incremental load (J8) with the micro-batch loop handled by
  Spark instead of an external scheduler. ``Trigger.AvailableNow`` makes
  it a catch-up batch job; remove the trigger for continuous tailing.
- :func:`watermarked_hourly_rollup` — windowed aggregation with a
  watermark for late data; the streaming twin of
  ``plans.events_queries.events_hourly_rollup``.

State stores, checkpoints and exactly-once bookkeeping are Spark's; at
scale the knobs that matter are the watermark horizon (state size) and
``spark.sql.shuffle.partitions`` for the stateful agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import anti_join_new_rows


def stream_incremental_load(
    spark: SparkSession,
    input_path: str,
    schema: str,
    key: str,
    target_path: str,
    checkpoint_path: str,
    transform=None,
) -> None:
    """Incrementally load new files from ``input_path`` into
    ``target_path``, inserting only keys not already present (the
    reference's anti-join incremental semantics, OUTBOUND.py:206-224).
    Runs as an available-now catch-up and returns when caught up."""

    def _upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        out = transform(batch_df) if transform is not None else batch_df
        try:
            existing = spark.read.parquet(target_path)
        except AnalysisException as exc:
            # ONLY the first-ever-batch case (target not created yet) may
            # fall back to empty — treating ANY read failure (transient
            # storage error, permissions, corrupt footer) as "target is
            # empty" would defeat the anti-join and append the whole
            # batch as duplicates
            if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
                raise
            existing = spark.createDataFrame([], out.schema)
        new_rows = anti_join_new_rows(out, existing, key)
        # the anti-join itself makes batch REPLAY idempotent: re-delivered
        # rows already in the target are filtered out by key
        new_rows.write.mode("append").parquet(target_path)

    (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .writeStream.foreachBatch(_upsert_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def stream_dedup(
    events: DataFrame,
    key_cols: list[str],
    *,
    watermark_col: str = "ts",
    horizon: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each key wins; repeat
    arrivals within the watermark horizon are dropped
    (``dropDuplicatesWithinWatermark``). The horizon is the state-size
    knob — state holds one entry per distinct key seen inside the horizon
    and evicts as the watermark advances, so memory is bounded by
    key-arrival rate × horizon, not by stream length. The streaming twin
    of the batch ``dedup_exact`` / anti-join incremental pattern: use this
    when the duplicate window is short (retries, at-least-once sources)
    and the anti-join load when dedup must span the whole history."""
    return events.withWatermark(watermark_col, horizon).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts_l",
    right_ts: str = "ts_r",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on `key` with a time-interval condition:
    right events within [left_ts, left_ts + within]. Both sides carry
    watermarks so Spark can bound the join state — each side buffers only
    rows younger than (watermark + interval) and evicts the rest, which is
    what makes a stream-stream join runnable forever at scale. The batch
    twin is the same join condition on static frames; the streaming test
    asserts exact agreement."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    # side-qualified time refs, like the key: bare F.col(ts) is ambiguous
    # the moment both streams name their event time identically ('ts' ==
    # 'ts'), which is the natural case
    return lw.join(
        rw,
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"interval {within}")),
    ).drop(rw[key])


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension.

    The static side is re-planned per micro-batch (so a dim refreshed
    between batches is picked up). ``broadcast=True`` (default) forces
    the map-only shape for genuinely small dims — the stream side never
    shuffles and carries no join state, unlike stream-stream joins. The
    hint OVERRIDES Spark's size-based planning and cannot be demoted, so
    pass ``broadcast=False`` for a dimension near or over executor
    memory and let AQE plan the per-micro-batch join instead. This is
    the streaming twin of the reference's lookup enrichment
    (FULL.py:411-475); at 100 TB/day of events the dim broadcast is what
    keeps the hot path map-only."""
    return stream.join(F.broadcast(dim) if broadcast else dim, key, how)


def watermarked_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming windowed agg with late-data watermark; pass a streaming
    DataFrame with (ts timestamp, event_type string, value double)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal-sum then double: associative-exact accumulation, so
            # the emitted value is bit-identical to the batch twin (and its
            # DuckDB oracle) regardless of micro-batch partial-agg order
            F.sum(F.col("value").cast("decimal(27,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_ts"), "event_type", "n_events", "total_value"
        )
    )
