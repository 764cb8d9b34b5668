"""Semantic checks for the lexical + hybrid retrieval queries (oracle
parity is covered by test_oracle_parity): BM25 scores only docs that
contain a query term and respects the tf monotonicity on a controlled
frame; RRF fusion scores decompose exactly into the rank reciprocals."""

from __future__ import annotations

import pyspark.sql.functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import rag as m


def test_bm25_only_scores_term_matching_docs(spark, sf_dir):
    out = m.bm25_retrieval(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= m._BM25_TOPK
    assert all(r.bm25 > 0 for r in rows)
    # every returned doc really contains at least one query term
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    ids = [r.doc_id for r in rows]
    texts = {
        r.doc_id: r.text.lower()
        for r in docs.where(F.col("doc_id").isin(ids)).collect()
    }
    for i in ids:
        assert any(t in texts[i] for t in m.QUERY_TERMS), i
    # descending, ties impossible after the 6-dp round + doc_id ordering
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_score_decomposes_into_rank_reciprocals(spark, sf_dir):
    rows = m.hybrid_retrieval_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= m._BM25_TOPK
    for r in rows:
        want = 0.0
        if r.lex_rank is not None:
            want += 1.0 / (m._RRF_K + r.lex_rank)
        if r.sem_rank is not None:
            want += 1.0 / (m._RRF_K + r.sem_rank)
        assert abs(r.rrf_score - round(want, 6)) < 1e-9
        assert r.lex_rank is not None or r.sem_rank is not None
    # a doc in BOTH lists at rank 1 would dominate; at minimum the top
    # fused doc must beat any single-list tail contribution
    top = rows[0].rrf_score
    assert top >= 1.0 / (m._RRF_K + m._FUSE_DEPTH)


def test_ndcg_is_bounded_and_zero_iff_no_lang_hits(spark, sf_dir):
    out = {r.query_id: r for r in m.retrieval_ndcg(spark, sf_dir).collect()}
    assert len(out) > 0
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    res = m.rag_retrieval_pipeline(spark, sf_dir)
    hits = (
        res.join(docs.select(F.col("doc_id").alias("query_id"), F.col("lang").alias("ql")), "query_id")
        .join(docs.select("doc_id", F.col("lang").alias("cl")), "doc_id")
        .where(F.col("ql") == F.col("cl"))
        .groupBy("query_id")
        .count()
    )
    n_hits = {r.query_id: r["count"] for r in hits.collect()}
    for qid, r in out.items():
        assert 0.0 <= r.ndcg <= 1.0
        assert (r.ndcg > 0) == (n_hits.get(qid, 0) > 0)
        # perfect prefix => ndcg == 1: if every retrieved item is a hit
        if n_hits.get(qid, 0) == r.k:
            assert r.ndcg == 1.0
