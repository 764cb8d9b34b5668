"""Delimited/JSON file sources and sinks — the landing formats that feed a
parquet lake (reference entry point C lands RDBMS extracts; raw drops in
practice arrive as CSV/JSON, and the reference's REST path stages JSON
before `spark.read.json`, SURVEY.md §2.1 S5).

Design rule: **explicit schema first**. `inferSchema`/sampling forces an
extra full pass over the input (at 100 TB, a full extra scan) and can flip
types between runs when the sample shifts. Schema inference is allowed only
behind `infer=True` for exploration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    *,
    header: bool = True,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """CSV scan. With an explicit schema the read is a single streaming
    pass; malformed rows land in `_corrupt_record` under the default
    PERMISSIVE mode rather than failing the 1000-executor job."""
    if schema is None and not infer:
        raise ValueError(
            "read_csv requires an explicit schema (or infer=True for "
            "exploration — inference is a full extra pass over the input)"
        )
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, *, header: bool = True, **options: str
) -> None:
    df.write.mode("overwrite").options(
        header=str(header).lower(), **options
    ).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    *,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines scan (one object per line — the only JSON layout that
    splits across executors; multiLine forces one task per file)."""
    if schema is None and not infer:
        raise ValueError(
            "read_json requires an explicit schema (or infer=True)"
        )
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, **options: str) -> None:
    df.write.mode("overwrite").options(**options).json(path)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """ORC scan — self-describing columnar like parquet (schema travels
    with the file), with the same predicate/column pushdown behavior, so
    no explicit-schema requirement."""
    return spark.read.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, **options: str) -> None:
    df.write.mode("overwrite").options(**options).orc(path)
