"""Semantic checks for llm_ops5 (embedding-space curation + tokenizer
induction). Cross-engine value parity is covered by test_oracle_parity;
these pin the operator SEMANTICS: dedup keeps the lowest id of every
near-dup pair, k-means assignments are integer-exact argmins, BPE merges
are real adjacent pairs with non-increasing counts."""

from __future__ import annotations

import pyspark.sql.functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import llm_ops5 as m


def test_kmeans_assignment_is_argmin(spark, sf_dir):
    out = m.embedding_kmeans(spark, sf_dir)
    rows = out.collect()
    n = m.read_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n  # every vector assigned exactly once
    assert all(r.sq_dist >= 0 for r in rows)
    assert out.select("cluster").distinct().count() <= m._K


def test_semantic_dedup_keeps_lowest_id(spark, sf_dir):
    out = m.semantic_dedup(spark, sf_dir).cache()
    # the lowest vec_id of each cluster can never be dropped: a drop
    # requires a LOWER id in the same cluster
    mins = out.groupBy("cluster").agg(F.min("vec_id").alias("vec_id"))
    joined = out.join(mins, ["cluster", "vec_id"])
    assert joined.where(~F.col("kept")).count() == 0
    # total rows = corpus size (dedup flags, never deletes silently)
    n = m.read_table(spark, sf_dir, "embeddings").count()
    assert out.count() == n


def test_quality_classifier_score_bounds(spark, sf_dir):
    out = m.quality_linear_classifier(spark, sf_dir)
    bad = out.where(
        (F.col("score") > F.col("n_tokens") * 1000)
        | (F.col("score") < F.col("n_tokens") * -1000)
    )
    assert bad.count() == 0  # per-token weights live in [-1000, 1000]
    assert out.where(F.col("accept") != (F.col("score") >= 0)).count() == 0


def test_bpe_merges_are_ordered_and_consistent(spark, sf_dir):
    rows = m.bpe_merge_induction(spark, sf_dir).orderBy("step").collect()
    assert [r.step for r in rows] == [1, 2, 3]
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
        assert r.pair_count > 0
    # a later merge can never count higher than the first (the first is
    # the global argmax and merging only removes pair occurrences of the
    # chosen pair; other counts are unchanged or grow only via the new
    # merged symbol, which did not exist at step 1... except pairs formed
    # WITH the merged symbol — so only assert step1 >= step2 when neither
    # side of step2 is step1's merged symbol)
    s1, s2 = rows[0], rows[1]
    if s1.merged not in (s2.left_sym, s2.right_sym):
        assert s1.pair_count >= s2.pair_count


def test_dataset_card_totals(spark, sf_dir):
    out = m.dataset_card_stats(spark, sf_dir)
    docs = m.read_table(spark, sf_dir, "documents")
    total = out.agg(F.sum("n_docs")).first()[0]
    assert total == docs.count()
    bad = out.where(
        (F.col("distinct_docs") > F.col("n_docs"))
        | (F.col("top_lang_docs") > F.col("n_docs"))
        | (F.col("dup_docs") < 0)
    )
    assert bad.count() == 0


def test_ivf_kmeans_recall_and_determinism(spark, sf_dir):
    """The learned-quantizer IVF is approximate in candidate generation
    only: its top-5 should overlap the exact cosine top-5 for most
    queries, and repeated runs must be identical (no RNG anywhere)."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.similarity import (
        cosine_topk,
    )

    emb = m.read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < m._IVF_NQUERIES)
    exact = cosine_topk(emb, queries, k=m._IVF_TOPK).collect()
    approx = m.embedding_ivf_kmeans_topk(spark, sf_dir).collect()

    exact_keys = {(r.query_id, r.neighbor_id) for r in exact}
    hits = sum((r.query_id, r.neighbor_id) in exact_keys for r in approx)
    assert hits >= len(exact_keys) // 4, "IVF-kmeans recall collapsed"

    again = m.embedding_ivf_kmeans_topk(spark, sf_dir).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))


def test_bpe_encode_bounds(spark, sf_dir):
    """Merges only ever shrink the symbol stream: tokens <= symbols <=
    chars, and a document's symbol count can never grow past its char
    count (identity if no merge applies)."""
    out = m.bpe_encode_corpus(spark, sf_dir)
    bad = out.where(
        (F.col("n_bpe_symbols") > F.col("n_chars"))
        | (F.col("n_bpe_symbols") < F.col("n_tokens"))
    )
    assert bad.count() == 0


def test_chat_template_offsets_are_consistent(spark, sf_dir):
    out = m.chat_template_assembly(spark, sf_dir).collect()
    end_len = len("<|end|>")
    for r in out:
        assert 1 <= r.resp_start <= r.template_len
        # resp_end + end tag reaches exactly the template end
        assert r.resp_end + end_len == r.template_len
        assert len(r.template_digest) == 32


def test_contrastive_labels_are_disjoint(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops5 import (
        contrastive_pair_mining,
    )

    out = contrastive_pair_mining(spark, sf_dir).cache()
    dup = out.groupBy("doc_a", "doc_b").count().where(F.col("count") > 1)
    assert dup.count() == 0  # a pair carries exactly one label
    labels = {r.label for r in out.select("label").distinct().collect()}
    assert labels <= {0, 1} and 0 in labels


def test_cluster_prototype_selection_quota_and_prototypicality(spark, sf_dir):
    """Per-cluster quota is exactly ceil(0.25 * size) rows (never an
    emptied cluster), kept rows are the cluster's CLOSEST members (every
    kept sq_dist <= every dropped sq_dist within the cluster, tie-broken
    by vec_id), and the selection is a strict subset of the kmeans
    assignment it claims to reuse."""
    import math

    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops5 import (
        _PROTO_KEEP_FRAC,
        cluster_prototype_selection,
        embedding_kmeans,
    )

    kept = cluster_prototype_selection(spark, sf_dir).collect()
    base = {
        (r.vec_id, r.cluster, r.sq_dist)
        for r in embedding_kmeans(spark, sf_dir).collect()
    }
    assert {(r.vec_id, r.cluster, r.sq_dist) for r in kept} <= base

    by_cluster: dict[int, list] = {}
    for r in kept:
        by_cluster.setdefault(r.cluster, []).append(r)
    sizes = {}
    for (v, c, d) in base:
        sizes[c] = sizes.get(c, 0) + 1
    assert set(by_cluster) == set(sizes)  # no cluster emptied
    for c, rows in by_cluster.items():
        quota = math.ceil(sizes[c] * _PROTO_KEEP_FRAC)
        assert len(rows) == quota, (c, len(rows), quota)
        assert rows and max(r.rank_in_cluster for r in rows) == quota
        assert all(r.cluster_size == sizes[c] for r in rows)
        # prototypicality: kept (sq_dist, vec_id) pairs are the quota
        # smallest of the whole cluster
        cluster_all = sorted(
            (d, v) for (v, cc, d) in base if cc == c
        )[:quota]
        assert sorted((r.sq_dist, r.vec_id) for r in rows) == cluster_all
