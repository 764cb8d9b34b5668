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
    the reference's crawler loop (FULL.py:106-141); :func:`sync_partitions`
    is the incremental equivalent that scales to huge partition counts.
    """
    kv = ", ".join(f"{k}='{v}'" for k, v in spec.items())
    spark.sql(f"ALTER TABLE {table} ADD IF NOT EXISTS PARTITION ({kv})")


def ensure_table(
    spark: SparkSession,
    table: str,
    path: str,
    schema_source: DataFrame | None = None,
    partition_cols: tuple[str, ...] = (),
    timeout_s: float = 30.0,
    poll_interval_s: float = 0.5,
) -> bool:
    """K4 — the reference's crawler lifecycle (FULL.py:106-141) as a
    catalog operation. The Glue job polls the crawler to READY, starts it
    to infer the table's schema from the files, and re-polls until the
    table exists; here the inference step is ``CREATE TABLE … USING
    parquet LOCATION`` (schema + partition discovery from the files —
    exactly what the crawler produces), with a ``saveAsTable`` fallback
    from an explicit DataFrame schema when the path has no files yet (the
    crawler has nothing to infer from; the reference would fail here).

    The poll loop is kept because against a real lakehouse catalog
    (Glue/HMS) registration is asynchronous — ``tableExists`` may lag the
    DDL. Returns True if the table was created, False if it already
    existed. Raises TimeoutError if the catalog never reports the table.

    Only the no-files-to-infer-from failure falls back to ``saveAsTable``
    (with ``partition_cols`` so later ADD PARTITION / sync_partitions
    still work); anything else — bad identifier, catalog outage — is a
    real error and re-raises.
    """
    import time

    from pyspark.errors import AnalysisException

    if spark.catalog.tableExists(table):
        return False
    try:
        spark.sql(f"CREATE TABLE {table} USING parquet LOCATION '{path}'")
    except AnalysisException as exc:
        # schema inference finds nothing at an empty/missing location;
        # that is the one condition the crawler-less fallback covers
        empty_location = exc.getCondition() in (
            "UNABLE_TO_INFER_SCHEMA",
            "PATH_NOT_FOUND",
        )
        if not empty_location or schema_source is None:
            raise
        # empty path: register from the writer's schema instead
        writer = schema_source.limit(0).write.option("path", path)
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.saveAsTable(table)
    deadline = time.monotonic() + timeout_s
    while not spark.catalog.tableExists(table):
        if time.monotonic() > deadline:
            raise TimeoutError(f"catalog never reported table {table}")
        time.sleep(poll_interval_s)
    return True


def sync_partitions(spark: SparkSession, table: str, path: str) -> list[str]:
    """Incremental crawler pass: diff the filesystem's Hive-style partition
    directories against the catalog and ``ADD PARTITION`` only the missing
    ones. Returns the newly registered specs (``col=value`` or
    ``col=value/col2=value2`` strings, matching ``SHOW PARTITIONS``).

    This is what the reference's crawler re-run does after each snapshot
    write (FULL.py:137). ``MSCK REPAIR TABLE`` is the blunt equivalent —
    but MSCK re-lists the ENTIRE table path, which at 100 TB with years of
    daily snapshots (10^5-10^6 partitions) is a full-listing storm per
    run; diff-and-add touches only the delta, like the crawler's
    incremental mode.

    Listing goes through the Hadoop FileSystem API, so the same code works
    on local paths and object stores (s3a://…) — a driver-local
    ``os.listdir`` would throw on any URI — and recurses into nested
    ``col=value`` directories for multi-level partition specs.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def walk(dir_path, prefix: str) -> list[str]:
        subdirs = []
        for status in fs.listStatus(dir_path):
            name = status.getPath().getName()
            if status.isDirectory() and "=" in name and not name.startswith(("_", ".")):
                subdirs.append((name, status.getPath()))
        if not subdirs:
            return [prefix] if prefix else []
        specs = []
        for name, child in sorted(subdirs):
            specs.extend(walk(child, f"{prefix}/{name}" if prefix else name))
        return specs

    known = set(show_partitions(spark, table))
    added = []
    for spec in walk(hpath, ""):
        if spec not in known:
            add_partition(
                spark,
                table,
                dict(seg.split("=", 1) for seg in spec.split("/")),
            )
            added.append(spec)
    return added
