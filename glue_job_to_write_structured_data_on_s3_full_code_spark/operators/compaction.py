"""Small-file compaction — rewrite a parquet dataset into files near a
target size.

Why it's first-class: every incremental pattern in the reference (per-run
partition overwrites, FULL.py:72; per-job_run_id appends, OUTBOUND.py:61-65)
accretes small files, and at 100 TB scan cost is dominated by file-open and
footer-read overhead once files drop below a few MB. Compaction is the
maintenance job that keeps `maxPartitionBytes`-sized splits meaningful.

Sizing is measured, not guessed: the source's byte size comes from the
filesystem (Hadoop FS API — works for file://, s3a://, hdfs:// alike), and
the output file count is `ceil(bytes / target)`. `coalesce` (no shuffle:
each task reads several input files) is used when shrinking the file count;
`repartition` only when the input has *fewer* partitions than wanted.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    n_files: int = 8,
) -> None:
    """Write parquet range-clustered on `cluster_cols`: rows are range-
    partitioned across files and sorted within each, so every file and
    row group covers a narrow [min, max] slice of the cluster key.

    This is what makes parquet stats-based data skipping real: a scan
    with a predicate on the cluster column prunes whole row groups /
    files from their footers instead of reading and filtering. At 100 TB
    this is the difference between scanning a month and scanning the lake
    for a one-month query — the layout twin of partitionBy for columns
    too high-cardinality to be partition keys (timestamps, ids).
    Verified in tests/test_plan_quality.py by reading the footer stats.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_value(col_a, col_b, bounds_a: tuple, bounds_b: tuple):
    """32-bit Z-value (Morton code) of two numeric columns: each scaled
    to a 16-bit bucket over its [min, max] bounds, then bit-interleaved.
    Pure JVM expressions (32 shift/mask terms — codegen handles this)."""
    from pyspark.sql import functions as F

    def bucket16(c, lo, hi):
        lo_f, hi_f = float(lo), float(hi)
        span = hi_f - lo_f if hi_f > lo_f else 1.0
        b = F.floor((c.cast("double") - F.lit(lo_f)) / F.lit(span) * 65536)
        return F.least(F.greatest(b, F.lit(0)), F.lit(65535)).cast("long")

    ba = bucket16(col_a, *bounds_a)
    bb = bucket16(col_b, *bounds_b)
    z = F.lit(0).cast("long")
    for i in range(16):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ba, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(bb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    n_files: int = 8,
) -> None:
    """Write parquet Z-ORDER clustered on two columns: rows are range-
    partitioned and sorted by their Morton code, so every file/row group
    covers a small rectangle in (col_a, col_b) space and footer min/max
    stats prune scans filtered on EITHER or BOTH columns.

    Range clustering (:func:`write_range_clustered`) skips on one leading
    column only; Z-order is the multi-column data-skipping layout (what
    Delta/Iceberg OPTIMIZE ZORDER does). Column bounds come from one tiny
    agg — at 100 TB that min/max scan is footer-only.
    Verified in tests/test_plan_quality.py: a box predicate on both
    columns prunes most row groups from the Z-ordered layout, none from a
    hash-scattered one.
    """
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    if lo_a is None or lo_b is None:
        # empty input: min/max are NULL and bucket16 would crash on
        # float(None) — write the empty dataset like write_range_clustered
        # does, so a scheduled re-cluster over many tables survives an
        # empty one
        df.write.mode("overwrite").parquet(path)
        return
    z = zorder_value(F.col(col_a), F.col(col_b), (lo_a, hi_a), (lo_b, hi_b))
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under `path` via the Hadoop FileSystem API."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    return fs.getContentSummary(jpath).getLength()


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite `src_path` parquet into `dst_path` with files sized near
    `target_file_bytes`. Returns the output file count."""
    size = dataset_bytes(spark, src_path)
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(src_path)
    if df.rdd.getNumPartitions() >= n_files:
        out = df.coalesce(n_files)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files
