"""Focused pins for the r16 optimization-round internals.

- ngram_contamination_check is size-gated between a join branch (small
  inputs) and the r15 window branch (scale); the gate is a pure
  performance dial, so both branches must stay ROW-IDENTICAL.
- simhash's conv/shift bit extraction must be bit-identical to the
  substring+isin spelling it replaced (the oracle's spelling).
- perceptual_hash spreads ONLY the decode path: the byte-tile mode's
  100 TB contract is that payloads stay in their scan partitions.
- incremental_corpus_dedup's digest checkpoint must not change verdicts
  (covered by oracle parity; pinned here at fixture scale for speed).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_contamination_branches_identical(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops3 import (
        ngram_contamination_check,
    )

    join_branch = ngram_contamination_check(spark, sf_dir)
    window_branch = ngram_contamination_check(
        spark, sf_dir, small_input_max_bytes=0
    )
    assert join_branch.schema == window_branch.schema
    a = sorted(tuple(r) for r in join_branch.collect())
    b = sorted(tuple(r) for r in window_branch.collect())
    assert a == b and a  # identical and non-empty


def test_simhash_conv_matches_substring_form(spark, sf_dir):
    """The conv/shift rewrite vs the original substring+isin aggregation
    (also the DuckDB oracle's spelling), bit-identical per doc."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        _doc_tokens,
        simhash,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import (
        read_table,
    )

    docs = read_table(spark, sf_dir, "documents")
    bits = 32
    doc_tok = _doc_tokens(docs, "text", "doc_id").withColumn(
        "_h", F.md5(F.col("tok"))
    )
    high = list("89abcdef")
    aggs = [
        F.sum(
            F.when(F.substring(F.col("_h"), j + 1, 1).isin(high), 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    sums = doc_tok.groupBy("doc_id").agg(*aggs)
    bit_cols = [
        F.when(F.col(f"s{j}") > 0, "1").otherwise("0") for j in range(bits)
    ]
    legacy = {
        r.doc_id: r.simhash_bits
        for r in sums.select(
            "doc_id", F.concat(*bit_cols).alias("simhash_bits")
        ).collect()
    }
    got = {
        r.doc_id: r.simhash_bits
        for r in simhash(docs, "text", "doc_id", bits=bits).collect()
    }
    assert got == legacy and got


def test_simhash_rejects_out_of_range_bits(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        simhash,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import (
        read_table,
    )

    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        simhash(docs, "text", "doc_id", bits=33)
    with pytest.raises(ValueError):
        simhash(docs, "text", "doc_id", bits=0)


def test_cosine_pre_matches_inline_form(spark):
    """Hoisted-norm cosine (_cosine_pre over _norm_col columns) must be
    BIT-identical to the inline _cosine_cols — same doubles in, IEEE
    multiply/divide out — or every ANN ranking tie-break could drift."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.similarity import (
        _cosine_cols,
        _cosine_pre,
        _norm_col,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, -3.5, 0.25], [0.5, -1.0, 2.0, 7.125]),
            (2, [0.1, 0.2, 0.3, -0.4], [9.0, 8.0, 7.0, 6.0]),
            (3, [1e-7, 2e300, -3e-9, 1.0], [4.0, 5e-300, 6.0, -1e9]),
        ],
        "id long, a array<double>, b array<double>",
    )
    rows = (
        df.withColumn("_na", _norm_col("a"))
        .withColumn("_nb", _norm_col("b"))
        .select(
            _cosine_pre("a", "b", "_na", "_nb").alias("fast"),
            _cosine_cols("a", "b").alias("slow"),
        )
        .collect()
    )
    for r in rows:
        assert r.fast == r.slow  # bit-identical, not approximately equal


def test_phash_byte_tile_keeps_partitioning(spark):
    """decode=False must NOT repartition: the payload exchange costs more
    than the cheap numpy kernel's parallelism buys (r16 A/B), and the
    operator's scale contract is payloads-stay-put."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.multimodal import (
        perceptual_hash,
    )

    df = spark.createDataFrame(
        [(i, bytes([i % 251] * 64)) for i in range(100)],
        "doc_id long, payload binary",
    ).coalesce(1)
    out = perceptual_hash(df, grid=32, block=4)
    assert out.rdd.getNumPartitions() == 1  # no spread inserted
    assert len(out.collect()) == 100
