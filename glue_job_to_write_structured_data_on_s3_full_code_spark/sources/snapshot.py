"""Snapshot-partitioned writes + catalog partition management.

Reference operators K1/K4/K5 and D1-D3 (SURVEY.md §2.2, §2.11):

- FULL.py:72 embeds ``dataset_date=…`` in the write *path* and then
  registers the partition by hand (``ALTER TABLE … ADD PARTITION``,
  FULL.py:129) or by triggering a crawler (FULL.py:106-141). The idiomatic
  Spark form is a real partition column + ``partitionBy`` — pruning then
  works for free and no side-channel catalog sync is needed.
- Overwrite is scoped to the written partitions (dynamic partition
  overwrite), matching the reference's idempotent per-snapshot re-run
  semantics (OUTBOUND.py:65 ``job_run_id`` partition) without clobbering
  history — critical at 100 TB where the table holds years of snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stamp_snapshot(df: DataFrame, col: str = "snapshot_dt", value: str | None = None) -> DataFrame:
    """K5: append the snapshot stamp column before write (FULL.py:1447).

    With ``value=None`` uses ``current_timestamp()`` like the reference;
    passing an explicit value keeps runs reproducible.
    """
    stamp = F.current_timestamp() if value is None else F.lit(value)
    return df.withColumn(col, stamp)


def write_snapshot(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("snapshot_dt",),
    mode: str = "overwrite",
) -> None:
    """K1 as a real partitioned write (idiomatic replacement for the
    path-embedded partition at FULL.py:72)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partition(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("snapshot_dt",),
) -> None:
    """Idempotent re-run of one snapshot: only the partitions present in
    ``df`` are replaced (dynamic partition overwrite), other snapshots are
    untouched."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def show_partitions(spark: SparkSession, table: str) -> list[str]:
    """D2: ``SHOW PARTITIONS db.tbl`` (FULL.py:125)."""
    return [r[0] for r in spark.sql(f"SHOW PARTITIONS {table}").collect()]


def add_partition(spark: SparkSession, table: str, spec: dict[str, str]) -> None:
    """D3: ``ALTER TABLE … ADD PARTITION`` (FULL.py:129-130), idempotent.

    For path-managed tables ``MSCK REPAIR TABLE`` is the bulk equivalent of
    the reference's crawler loop (FULL.py:106-141).
    """
    kv = ", ".join(f"{k}='{v}'" for k, v in spec.items())
    spark.sql(f"ALTER TABLE {table} ADD IF NOT EXISTS PARTITION ({kv})")
