"""Raw object reads — reference operator S6 (SURVEY.md §2.1).

FULL.py:102-104 lists an S3 prefix and ``get_object``s each key in a
driver-side boto3 loop — fine for a handful of config blobs, a
single-machine bottleneck for anything else. The Spark-native equivalent
is the ``binaryFile`` file source: each object becomes one row
(path, modificationTime, length, content) and the fetches run
partition-parallel on the executors, with ``pathGlobFilter`` /
``modifiedAfter`` pushed into the listing instead of a driver-side
filter loop. Against S3 the same code runs via the s3a committer —
locally it reads any filesystem directory, which is what the tests use.

Scale notes: the listing itself is parallelized by Spark's in-memory
file index; ``recursiveFileLookup`` handles non-partitioned prefixes.
One row per object means executor memory bounds the largest single
object (binaryFile caps at 2 GiB/row) — beyond that, the object is not
a "row" anymore and belongs in a format reader, not a raw read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_raw_objects(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modified_after: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read every object under ``path`` as one row of
    (path, modificationTime, length, content: binary).

    ``glob`` (e.g. ``*.json``) and ``modified_after`` (ISO timestamp)
    are pushed into the file listing — the distributed twin of the
    reference's list-then-loop (FULL.py:102-104).
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if modified_after is not None:
        reader = reader.option("modifiedAfter", modified_after)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def read_raw_text(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    encoding: str = "UTF-8",
) -> DataFrame:
    """Raw objects decoded to strings: (path, length, text). The decode
    happens executor-side on the binary column — the driver never sees
    object contents (unlike the reference's ``obj['Body'].read()``)."""
    return read_raw_objects(spark, path, glob=glob).select(
        "path",
        "length",
        F.decode(F.col("content"), encoding).alias("text"),
    )
