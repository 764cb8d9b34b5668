"""Training-shard writer — the sink half of `plans.llm_ops6.
training_shard_export`: materialize a corpus as N shard files whose
within-shard row order is the md5-draw epoch shuffle.

This is the exact plan shape the export query's docstring promises at
scale: one hash repartition on the shard key (each shard's rows land in
exactly one task), a task-local sort (NO global sort — shards order
independently), and a Hive-partitioned write so every shard directory
holds exactly one file a data loader can stream sequentially. Nothing
here collects; N scales with corpus size so a shard stays ~one output
file (~1 GB in production).

Reference lineage: the partitioned-overwrite sink shape is FULL.py:72's
`dataset_date=` path embedding done Spark-natively (partitionBy), applied
to the training-export use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_col: str = "shard_id",
    order_cols: tuple[str, ...] = ("draw", "doc_id"),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as one sorted parquet file per shard directory.

    ``repartition(n, shard)`` routes every row of a shard to a single
    task (hash partitioning may co-locate several shards in one task —
    harmless, ``partitionBy`` still splits them into their own
    directories, and each directory then receives exactly one file).
    ``sortWithinPartitions`` orders rows task-locally by the draw; since
    a shard never spans tasks, the per-directory file is fully sorted.
    """
    (
        df.repartition(n_shards, F.col(shard_col))
        .sortWithinPartitions(shard_col, *order_cols)
        .write.mode(mode)
        .partitionBy(shard_col)
        .parquet(path)
    )
