"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.10); this is the north-star
"custom stateful operator" capability (task brief: ``applyInPandasWithState``
for operators Spark's built-ins can't express). It is the streaming twin of
``plans.events_queries.events_sessionization`` (lag + running-sum over a
user window): per-user state carries ``(last event ts, current session
number)`` across micro-batches, so a session spanning batches keeps its
number and the concatenated update-mode output is *identical row-for-row*
to the batch query — which is how the test pins it.

Scale notes:
- state is two scalars per user (bounded by |users|, not |events|);
- each micro-batch shuffles once on ``user_id`` to co-locate groups —
  the same single shuffle the batch window query pays;
- correctness requires per-user event-time order *across* batches
  (in-order source or upstream watermark+sort); within a batch we sort.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "event_id long, user_id long, ts timestamp, session_num long"
STATE_SCHEMA = "last_epoch_us long, session_num long"


def stateful_sessionize(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """``events`` is a *streaming* DataFrame with (event_id, user_id, ts).
    Emits every event with its session number in update mode."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def assign(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_epoch, session_num = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"])
        # exact integer MICROSECONDS (ns → us is lossless int division):
        # a float-seconds epoch both loses ~ns precision and disagrees
        # with the batch twin's integer unix_micros gap on sub-second
        # timestamps (e.g. a true 1800.5 s gap), breaking the documented
        # row-for-row parity exactly at session boundaries
        epochs = batch["ts"].astype("int64") // 1_000
        gap_us = gap_sec * 1_000_000
        out_sessions = []
        for ep in epochs:
            if last_epoch is None or ep - last_epoch > gap_us:
                session_num += 1
            last_epoch = int(ep)
            out_sessions.append(session_num)
        state.update((last_epoch, session_num))
        yield pd.DataFrame(
            {
                "event_id": batch["event_id"].values,
                "user_id": batch["user_id"].values,
                "ts": batch["ts"].values,
                "session_num": out_sessions,
            }
        )

    return (
        events.select("event_id", "user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            assign,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_sessionize_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long",
    gap_sec: int = 1800,
) -> None:
    """Drive :func:`stateful_sessionize` over a directory of parquet files
    via the shared idempotent runner (one micro-batch per file, per-batch
    overwrite sink — see streaming/runner.py). Returns when caught up."""
    from .runner import run_file_stream

    run_file_stream(
        spark,
        input_dir,
        checkpoint_dir,
        output_dir,
        schema,
        lambda events: stateful_sessionize(events, gap_sec=gap_sec),
    )
