"""Semantic pins for the within-doc quality filters (llm_ops7): threshold
logic, short-doc gating, and hand-checked metric values on known inputs.
Cross-engine value parity is covered by test_oracle_parity."""

from __future__ import annotations

import pytest

import math

import pyspark.sql.functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import llm_ops7 as m


def _run_on_texts(spark, fn, texts, tmp_path):
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    return {r["doc_id"]: r for r in fn(spark, str(tmp_path)).collect()}


def test_repetition_metrics_hand_checked(spark, tmp_path):
    out = _run_on_texts(
        spark,
        m.gopher_repetition_filter,
        [
            "a b a b a b",  # bigrams: ab ba ab ba ab -> 5 grams, 2 distinct
            "one two three four five",  # all distinct
            "x y",  # below _MIN_TOKENS
        ],
        tmp_path,
    )
    r0 = out[0]
    assert r0["n_tokens"] == 6
    assert r0["dup_bigram_frac"] == round((5 - 2) / 5, 6)
    assert r0["top_bigram_share"] == round(3 / 5, 6)  # "a b" occurs 3x
    # "a b" covers 3 occurrences x 3 chars over 11 normalized chars
    assert r0["top_bigram_char_frac"] == round(9 / 11, 6)
    assert r0["keep"] is False
    r1 = out[1]
    assert r1["dup_bigram_frac"] == 0.0
    assert r1["dup_trigram_frac"] == 0.0
    # all bigrams distinct: share 1/4, but no bigram REPEATS — a
    # single-occurrence maximum is a length artifact, not repetition —
    # so the char-fraction metric is NULL and the doc must survive
    assert r1["top_bigram_share"] == 0.25
    assert r1["top_bigram_char_frac"] is None
    assert r1["keep"] is True
    r2 = out[2]
    assert r2["dup_bigram_frac"] is None and r2["keep"] is False


def test_entropy_hand_checked_and_short_doc_gated(spark, tmp_path):
    out = _run_on_texts(
        spark,
        m.token_entropy_filter,
        [
            "a a b b",  # two tokens at p=0.5 -> entropy exactly 1.0
            "q",  # short
        ],
        tmp_path,
    )
    assert out[0]["token_entropy"] == 1.0
    assert out[0]["keep"] is False  # 1.0 < ENTROPY_MIN
    assert out[1]["token_entropy"] is None and out[1]["keep"] is False


@pytest.mark.slow  # full-fixture python replay (~7 s)
def test_entropy_matches_python_on_fixture(spark, sf_dir):
    """Spot-check the fold against a driver-side recomputation for a few
    fixture docs (independent arithmetic path, same sorted-order sum)."""
    rows = (
        m.token_entropy_filter(spark, sf_dir)
        .where(F.col("token_entropy").isNotNull())
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

    docs = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .where(F.col("doc_id").isin([r["doc_id"] for r in rows]))
        .collect()
    }
    import re

    for r in rows:
        toks = re.sub(r"[^a-z0-9]+", " ", docs[r["doc_id"]].lower()).strip().split()
        n = len(toks)
        ent = -sum(
            (toks.count(d) / n) * math.log2(toks.count(d) / n)
            for d in sorted(set(toks))
        )
        assert abs(ent - r["token_entropy"]) < 1e-5


@pytest.mark.slow  # long-document scale stress (~45 s)
def test_filters_scale_to_long_docs(spark, tmp_path):
    """The O(distinct x n) per-doc terms stay tractable on a doc far
    longer than the fixture's (the documented bound is doc length, not
    corpus size)."""
    long_text = " ".join(f"tok{i % 500}" for i in range(5000))
    out = _run_on_texts(
        spark, m.gopher_repetition_filter, [long_text], tmp_path
    )
    assert out[0]["n_tokens"] == 5000
    assert out[0]["dup_bigram_frac"] is not None
