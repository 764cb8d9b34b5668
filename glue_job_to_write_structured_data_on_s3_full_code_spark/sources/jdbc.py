"""JDBC source — reference operator S3 (SURVEY.md §2.1; JDBC.sql:88-90).

The reference bulk-copies SQL Server tables to parquet:
``spark.read.format('jdbc').options(url=…, dbtable=…).load()`` then a
snapshot-path write. That single-options read is a SINGLE-PARTITION pull —
fine for lookup tables, fatal for the 41-table BCP inventory at scale
(BCP.sql:109-150). :func:`jdbc_reader` therefore exposes Spark's parallel
read knobs (partitionColumn/lowerBound/upperBound/numPartitions, or an
explicit predicate list) so a big table lands as N concurrent range scans.

No RDBMS exists in the test sandbox; :func:`jdbc_snapshot_to_parquet` is
exercised in production through any JDBC driver on the classpath, and the
option-assembly logic is unit-tested directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_options(
    url: str,
    dbtable: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **extra: str,
) -> dict[str, str]:
    """Assemble the option map (JDBC.sql:88 plus parallelism)."""
    opts: dict[str, str] = {"url": url, "dbtable": dbtable, "fetchsize": str(fetchsize)}
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    parallel = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(v is not None for v in parallel):
        if any(v is None for v in parallel):
            raise ValueError(
                "partition_column, lower_bound, upper_bound, num_partitions "
                "must be provided together for a parallel JDBC read"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.read.format("jdbc").options(**jdbc_options(**kwargs)).load()


def jdbc_snapshot_to_parquet(
    spark: SparkSession, path: str, snapshot_dt: str, **kwargs
) -> None:
    """The full JDBC.sql job: pull → stamp snapshot partition → parquet."""
    from .snapshot import stamp_snapshot, write_snapshot

    df = read_jdbc(spark, **kwargs)
    write_snapshot(stamp_snapshot(df, value=snapshot_dt), path)
