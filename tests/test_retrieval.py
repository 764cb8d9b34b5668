"""Semantic checks for the lexical + hybrid retrieval queries (oracle
parity is covered by test_oracle_parity): BM25 scores only docs that
contain a query term and respects the tf monotonicity on a controlled
frame; RRF fusion scores decompose exactly into the rank reciprocals."""

from __future__ import annotations

import pytest

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


def test_ndcg_null_for_zero_relevant_query(spark, tmp_path):
    """A query doc whose language is a SINGLETON has n_relevant = 0: the
    ideal ranking is undefined, so ndcg must be NULL — and the query must
    not throw (unguarded, the IDCG fold hits 1/log2(1) = DIVIDE_BY_ZERO
    under this repo's ANSI-enabled session; ADVICE r4 medium)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = (
        "vector stream window table filter join group sort merge scan "
        "query row data index hash page block cache disk spill"
    )
    texts = [
        base + " alpha beta gamma delta epsilon zeta",
        base + " alpha beta gamma delta theta kappa",
        base + " sigma tau upsilon phi chi psi omega",
        base + " alpha sigma tau mix of both clusters",
        base + " beta tau upsilon another corpus doc",
        base + " gamma phi chi yet another corpus doc",
    ]
    # doc 2 is the ONLY 'xx' doc → its query row has n_relevant = 0
    langs = ["en", "en", "xx", "en", "en", "en"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array([f"src{i % 2}" for i in range(6)]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    rows = {r.query_id: r for r in m.retrieval_ndcg(spark, str(tmp_path)).collect()}
    assert 2 in rows, "singleton-language query missing from the output"
    assert rows[2].n_relevant == 0
    assert rows[2].ndcg is None
    assert all(
        r.ndcg is not None and 0.0 <= r.ndcg <= 1.0
        for q, r in rows.items()
        if q != 2
    )

    # the oracle agrees row-for-row (NULL included)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    want = {
        int(q): (int(k), int(n), x)
        for q, k, n, x in con.execute(m.RETRIEVAL_NDCG_ORACLE).fetchall()
    }
    got = {
        q: (r.k, r.n_relevant, None if r.ndcg is None else round(r.ndcg, 6))
        for q, r in rows.items()
    }
    assert got == want


@pytest.mark.slow  # runs fast AND full recall reports (~14 s)
def test_ann_recall_fast_subset_matches_full_report(spark, sf_dir):
    """The reduced (bench-shaped) ann_recall_report must be a row-subset of
    the full default report: same recall figures for the shared methods,
    nothing else — so benching the cheap variant still tracks the numbers
    the full gate query verifies."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        ann_recall_report,
    )

    fast_methods = ("ivf_np1", "ivf_np2", "ivf_np3", "lsh_p4")
    full = {
        r.method: (r.n_queries, r.total_hits, r.recall_at_5)
        for r in ann_recall_report(spark, sf_dir).collect()
    }
    fast = {
        r.method: (r.n_queries, r.total_hits, r.recall_at_5)
        for r in ann_recall_report(spark, sf_dir, methods=fast_methods).collect()
    }
    assert set(fast) == set(fast_methods)
    for mth in fast_methods:
        assert fast[mth] == full[mth], mth


def test_ann_recall_unknown_method_raises(spark, sf_dir):
    import pytest

    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        ann_recall_report,
    )

    with pytest.raises(ValueError, match="unknown ANN recall"):
        ann_recall_report(spark, sf_dir, methods=("ivf_np1", "bogus"))
    with pytest.raises(ValueError, match="at least one method"):
        ann_recall_report(spark, sf_dir, methods=())
