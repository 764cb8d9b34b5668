"""Job-lifecycle compositions — the reference's three entry points
(SURVEY.md §3) as callable APIs:

- :func:`structuring_job` — entry point A (FULL.py): transform → snapshot
  stamp → partitioned write (idempotent per-partition overwrite) → catalog
  table registration → partition registration. The Glue-crawler poll loop
  (FULL.py:106-141) becomes :func:`..sources.snapshot.ensure_table`
  (poll-to-ready schema-inference registration, saveAsTable fallback for
  an empty path) + :func:`..sources.snapshot.sync_partitions` (the
  crawler's incremental discover-and-ADD-PARTITION pass — the SURVEY
  §2.2 K4 mapping).
- entry point B (OUTBOUND.py) is :func:`..plans.outbound.outbound_pipeline`.
- entry point C (JDBC.sql) is :func:`..sources.jdbc.jdbc_snapshot_to_parquet`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.flagship import flagship
from .session import tune
from .sources.snapshot import (
    ensure_table,
    overwrite_partition,
    show_partitions,
    sync_partitions,
)


def structuring_job(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    dataset_date: str,
    table: str = "structured_prospects",
    transform=flagship,
) -> DataFrame:
    """Run the inbound structuring job for one ``dataset_date`` partition.

    Idempotent per partition: re-running a date dynamically overwrites only
    that partition (the reference's snapshot-rerun semantics, FULL.py:72 +
    OUTBOUND.py job_run_id pattern). Returns a one-row summary frame.
    """
    tune(spark)
    out = transform(spark, sf_dir).withColumn(
        "snapshot_dt", F.date_format(F.current_timestamp(), "yyyyMMdd")
    )
    stamped = out.withColumn("dataset_date", F.lit(dataset_date))
    overwrite_partition(stamped, target_path, partition_cols=("dataset_date",))

    # crawler lifecycle (FULL.py:106-141): register the table by schema
    # inference if it doesn't exist, then an incremental discover-and-add
    # pass for any partition the catalog doesn't know yet
    # partition_cols flows into the saveAsTable fallback too, so even the
    # empty-path registration path creates a PARTITIONED table and the
    # sync_partitions / ADD PARTITION calls below stay valid
    ensure_table(
        spark,
        table,
        target_path,
        schema_source=stamped,
        partition_cols=("dataset_date",),
    )
    sync_partitions(spark, table, target_path)

    n = spark.table(table).where(F.col("dataset_date") == dataset_date).count()
    return spark.createDataFrame(
        [(dataset_date, n, len(show_partitions(spark, table)))],
        "dataset_date string, rows_in_partition long, n_partitions int",
    )
