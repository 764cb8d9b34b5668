"""Focused pins for the r15 optimization-round internals.

- session.spread_small_input must spread a narrow input (the local-mode
  knob) and must be a true NO-OP on an already-parallel input (the 100 TB
  contract: no unconditional payload shuffle).
- The F.expr-built cosine/dot helpers must be value-identical to the
  lambda-composed Column forms they replaced (same Catalyst tree, fewer
  py4j round-trips) — the registry-wide oracle parity covers end-to-end
  results; this pins the helper itself so a future edit cannot drift it.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_spread_small_input_spreads_narrow_input(spark):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.session import (
        spread_small_input,
    )

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    spread = spread_small_input(narrow)
    assert spread.rdd.getNumPartitions() == par


def test_spread_small_input_noop_on_parallel_input(spark):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.session import (
        spread_small_input,
    )

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000).repartition(par + 4)
    out = spread_small_input(wide)
    # the SAME DataFrame object comes back: no new repartition node, so
    # at scale (scan already parallel) there is nothing to shuffle
    assert out is wide
    assert out.rdd.getNumPartitions() == par + 4


def test_cosine_cols_matches_lambda_composition(spark):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.similarity import (
        _as_double_name,
        _cosine_cols,
        _dot,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, -3.5], [0.5, -1.0, 2.0]),
         (2, [0.1, 0.2, 0.3], [9.0, 8.0, 7.0])],
        "id long, a array<double>, b array<double>",
    )
    composed = (
        _dot(F.col("a"), F.col("b"))
        / (
            F.sqrt(_dot(F.col("a"), F.col("a")))
            * F.sqrt(_dot(F.col("b"), F.col("b")))
        )
    )
    rows = df.select(
        _cosine_cols("a", "b").alias("fast"), composed.alias("slow")
    ).collect()
    for r in rows:
        # bit-identical, not approximately equal: both forms must fold
        # the same tree in the same order
        assert r.fast == r.slow

    ints = spark.createDataFrame(
        [(1, [1, -2, 3])], "id long, v array<int>"
    )
    got = ints.select(_as_double_name("v").alias("d")).first().d
    assert got == [1.0, -2.0, 3.0]
