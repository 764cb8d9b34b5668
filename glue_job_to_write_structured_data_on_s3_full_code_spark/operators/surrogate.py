"""Surrogate business keys (reference operator W1, SURVEY.md §2.6).

The reference builds ``concat('PM', lpad(cast(row_number() over (order by
leadid) as string), 9, '0'))`` (FULL.py:413) — an exact sequential ID whose
global window collapses to ONE task. SURVEY.md §4 flags this as the
reference's one genuine scalability hazard, so we ship both:

- :func:`sequential_key` — exact parity semantics (single-partition window);
  fine after a heavy reduction, wrong on a 100 TB fact table.
- :func:`scalable_key` — distributed equivalent: per-partition offsets from
  a tiny driver-side prefix sum over partition counts, preserving the same
  global order without a single-task window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..session import eager_checkpoint


def _format_key(prefix: str, n: Column, width: int) -> Column:
    return F.concat(F.lit(prefix), F.lpad(n.cast("string"), width, "0"))


def sequential_key(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "surrogate_id",
    prefix: str = "PM",
    width: int = 9,
) -> DataFrame:
    """Exact reference semantics: global row_number over ``order_cols``."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(out_col, _format_key(prefix, F.row_number().over(w), width))


def scalable_key(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "surrogate_id",
    prefix: str = "PM",
    width: int = 9,
    num_partitions: int | None = None,
) -> DataFrame:
    """Same ids, distributed: range-partition by the order columns, number
    rows within each partition, then add per-partition offsets computed from
    partition counts (one tiny aggregate, no global single-task window).

    The range-partitioned frame with its ``__pid`` column is CHECKPOINTED
    before the numbering and the offset aggregate branch off it:
    ``repartitionByRange`` picks its boundaries by sampling, and the two
    consumers would otherwise each re-evaluate the lineage with an
    independently-sampled range exchange — local row numbers from one
    partitioning combined with offsets from a different one produce
    corrupt ids (observed at sf0.1: a whole boundary chunk shifted by 36;
    invisible at sf0.01 where the scan is a single split). Freezing the
    partitioning also pins ``spark_partition_id``, which is evaluation-
    dependent by definition. At 100 TB this materialization is the price
    of a stable numbering — still no single-task window anywhere."""
    parted = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    keyed = eager_checkpoint(
        parted.withColumn("__pid", F.spark_partition_id()),
        "scalable_surrogate_keyed",
    )
    with_pid = keyed.withColumn(
        "__local_rn",
        F.row_number().over(
            Window.partitionBy("__pid").orderBy(*order_cols)
        ),
    )
    # Partition counts are num_partitions rows — a broadcast-size table.
    offsets = keyed.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    offsets = offsets.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__cnt").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).drop("__cnt")
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col,
            _format_key(prefix, F.col("__offset") + F.col("__local_rn"), width),
        )
        .drop("__pid", "__local_rn", "__offset")
    )
