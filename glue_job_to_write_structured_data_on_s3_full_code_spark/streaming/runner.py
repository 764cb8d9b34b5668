"""Shared file-stream driver for the stateful streaming operators.

One place for the pattern both the sessionizer and the anomaly detector
(and any future ``applyInPandasWithState`` operator) need: read a
directory of parquet files one micro-batch per file — so cross-batch
state is actually exercised — run the transform, and land each
micro-batch through an IDEMPOTENT sink. ``foreachBatch`` is
at-least-once (a crash after the write but before the checkpoint commit
re-delivers the batch on restart), so a blind ``mode("append")`` sink
duplicates rows on replay; writing every micro-batch to its own
``batch_id=N`` partition directory with ``mode("overwrite")`` makes the
replay overwrite its previous (possibly partial) output instead — the
same replay-safety contract the stored-IVF append gets from its
idempotency token. Readers see ``batch_id`` as a partition column
documenting provenance and select their payload columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def run_file_stream(
    spark,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema: str,
    transform,
    output_mode: str = "update",
) -> None:
    """Drive ``transform(streaming_df) -> streaming_df`` over the parquet
    files in ``input_dir`` (one micro-batch per file, availableNow) and
    return when caught up. ``transform`` receives the schema-typed
    ``readStream`` frame."""
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(input_dir)
    )
    out = transform(events)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # no isEmpty() pre-check: that extra action evaluated the whole
        # micro-batch plan TWICE per batch (including the
        # applyInPandasWithState transform) since the frame isn't
        # persisted. Writing an empty batch's directory is harmless —
        # readers discover it as an empty batch_id partition — and one
        # evaluation per batch is the contract stateful transforms expect
        batch_df.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"batch_id={batch_id}")
        )

    (
        out.writeStream.foreachBatch(_sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
