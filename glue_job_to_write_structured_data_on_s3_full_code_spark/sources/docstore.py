"""Document-store connector passthrough — reference operators S4/K3
(SURVEY.md §2.1-2.2; OUTBOUND.py:70-96, 202-204, 349-350).

The reference reads/writes DocumentDB through Glue DynamicFrame with a
sampling partitioner (``MongoSamplePartitioner``, partitionKey ``_id``,
read partitionSizeMB effectively single-partition, write 10 MB — its read
partitioning is the scalability bug BASELINE.md records). In Spark-first
form this is just ``spark.read.format('mongodb')`` with partitioner
options passed through — any registered connector works.

No Mongo exists in the sandbox, so the same API runs against a
parquet-backed stand-in (``format='parquet_store'``): tests exercise the
connector plumbing (format dispatch, option passthrough, mode handling)
with identical code paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Defaults mirroring OUTBOUND.py:78-81 / 92-95, with the read-side
# partition size set to something sane instead of the reference's 1 TB
# single-partition value.
MONGO_READ_DEFAULTS = {
    "partitioner": "com.mongodb.spark.sql.connector.read.partitioner.SamplePartitioner",
    "partitioner.options.partition.field": "_id",
    "partitioner.options.partition.size": "64",  # MB
    "sampleSize": "100000",
}
MONGO_WRITE_DEFAULTS = {"retryWrites": "false"}


def read_document_store(
    spark: SparkSession,
    fmt: str,
    path_or_uri: str,
    options: dict[str, str] | None = None,
) -> DataFrame:
    opts = dict(MONGO_READ_DEFAULTS) if fmt == "mongodb" else {}
    opts.update(options or {})
    if fmt == "parquet_store":  # sandbox stand-in
        return spark.read.options(**opts).parquet(path_or_uri)
    if fmt == "mongodb":
        # the Mongo Spark connector takes its target from the
        # connection.uri OPTION — load(path) only sets an unused "path"
        # option and the connector would silently fall back to the
        # session-level uri (a different database than the one named)
        opts.setdefault("connection.uri", path_or_uri)
        return spark.read.format(fmt).options(**opts).load()
    return spark.read.format(fmt).options(**opts).load(path_or_uri)


def write_document_store(
    df: DataFrame,
    fmt: str,
    path_or_uri: str,
    mode: str = "append",
    options: dict[str, str] | None = None,
) -> None:
    opts = dict(MONGO_WRITE_DEFAULTS) if fmt == "mongodb" else {}
    opts.update(options or {})
    if fmt == "parquet_store":
        df.write.mode(mode).options(**opts).parquet(path_or_uri)
        return
    if fmt == "mongodb":
        # connection target rides the connection.uri option, not the
        # save() path (see read_document_store)
        opts.setdefault("connection.uri", path_or_uri)
        df.write.format(fmt).mode(mode).options(**opts).save()
        return
    df.write.format(fmt).mode(mode).options(**opts).save(path_or_uri)
