"""Custom stateful streaming operator #2: per-key running-baseline anomaly
detection with ``applyInPandasWithState``.

The fraud/ops-alerting twin of the stateful sessionizer: per-user state
carries ``(n_events, sum_cents)`` across micro-batches and every incoming
event is compared against the user's running mean — alert when the value
exceeds 3x the mean after at least 5 prior observations. All arithmetic is
integer (cents via ``floor(value*100 + 0.5)``), so the streamed output is
bit-identical to the batch window query and the DuckDB oracle can replay
it exactly: ``is_alert = n_prior >= 5 AND value_cents * n_prior >
3 * sum_prior_cents`` (the mean comparison cross-multiplied into integer
space — no division, no floats).

Scale notes:
- state is two scalars per user — bounded by |users|, not |events|;
- one shuffle per micro-batch (the groupBy key co-location), identical to
  what the batch window pays;
- per-user event-time order across batches is the in-order source
  requirement shared with the sessionizer; within a batch we sort.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "event_id long, user_id long, ts timestamp, value_cents long, "
    "n_prior long, sum_prior_cents long, is_alert boolean"
)
STATE_SCHEMA = "n long, s long"

MIN_HISTORY = 5
RATIO = 3  # alert when value > RATIO * running mean


def stateful_anomaly(events: DataFrame) -> DataFrame:
    """``events`` is a *streaming* DataFrame with (event_id, user_id, ts,
    value_cents). Emits every event with its prior-baseline stats and the
    alert flag in update mode."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def flag(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0)
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values(["ts", "event_id"])
        n_priors, sum_priors, alerts = [], [], []
        for vc in batch["value_cents"].astype("int64"):
            n_priors.append(n)
            sum_priors.append(s)
            alerts.append(bool(n >= MIN_HISTORY and vc * n > RATIO * s))
            n += 1
            s += int(vc)
        state.update((n, s))
        yield pd.DataFrame(
            {
                "event_id": batch["event_id"].values,
                "user_id": batch["user_id"].values,
                "ts": batch["ts"].values,
                "value_cents": batch["value_cents"].values,
                "n_prior": n_priors,
                "sum_prior_cents": sum_priors,
                "is_alert": alerts,
            }
        )

    return (
        events.select("event_id", "user_id", "ts", "value_cents")
        .groupBy("user_id")
        .applyInPandasWithState(
            flag,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_anomaly_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str = "event_id long, ts timestamp, user_id long, value_cents long",
) -> None:
    """Drive :func:`stateful_anomaly` over a directory of parquet files
    via the shared idempotent runner (one micro-batch per file, per-batch
    overwrite sink — see streaming/runner.py). Returns when caught up."""
    from .runner import run_file_stream

    run_file_stream(
        spark, input_dir, checkpoint_dir, output_dir, schema, stateful_anomaly
    )
