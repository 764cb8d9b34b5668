"""Semantic checks for llm_ops6 (training last-mile + retrieval diversity).
Cross-engine value parity is covered by test_oracle_parity; these pin the
operator SEMANTICS: shard export is a permutation with contiguous in-shard
positions, budget enforcement keeps an exact draw-order prefix and never
overshoots, MMR picks are distinct shortlist members led by the relevance
argmax, and purity is a valid per-cluster majority share."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import llm_ops6 as m
from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table


@pytest.fixture(autouse=True)
def _clear_cache(spark):
    """These tests cache the very plans test_plan_quality later inspects;
    a leaked InMemoryRelation would make the gate read the cached plan's
    string dump (which repeats the exchange in its Final/Initial plan
    sections) instead of the fresh plan. Drop all cache on the way out."""
    yield
    spark.catalog.clearCache()


def test_shard_export_is_a_permutation(spark, sf_dir):
    out = m.training_shard_export(spark, sf_dir).cache()
    docs = read_table(spark, sf_dir, "documents")
    # every doc appears exactly once, in exactly one shard
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    assert out.where((F.col("shard_id") < 0) | (F.col("shard_id") >= m.N_SHARDS)).count() == 0
    # positions within a shard are contiguous 1..n (no gaps/dups)
    per_shard = out.groupBy("shard_id").agg(
        F.count("*").alias("n"),
        F.min("pos_in_shard").alias("mn"),
        F.max("pos_in_shard").alias("mx"),
        F.count_distinct("pos_in_shard").alias("nd"),
    )
    bad = per_shard.where(
        (F.col("mn") != 1) | (F.col("mx") != F.col("n")) | (F.col("nd") != F.col("n"))
    )
    assert bad.count() == 0


def test_token_budget_never_overshoots_and_is_a_prefix(spark, sf_dir):
    out = m.token_budget_mix(spark, sf_dir).cache()
    assert out.where(F.col("cum_tokens") > m.TOKEN_BUDGET).count() == 0
    # kept set per source is a PREFIX of the draw order: the count of kept
    # docs equals the number of docs whose inclusive cumsum fits — recompute
    # independently with the same draw and compare per source
    docs = read_table(spark, sf_dir, "documents")
    from pyspark.sql import Window
    from glue_job_to_write_structured_data_on_s3_full_code_spark.functions.text import token_count

    draw = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|mix")))
    w = (
        Window.partitionBy("source")
        .orderBy("draw", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    expect = (
        docs.select("source", "doc_id", token_count("text").alias("n_tok"), draw.alias("draw"))
        .withColumn("cum", F.sum("n_tok").over(w))
        .where(F.col("cum") <= m.TOKEN_BUDGET)
        .groupBy("source")
        .agg(F.count("*").alias("n_expect"))
    )
    got = out.groupBy("source").agg(F.count("*").alias("n_got"))
    diff = expect.join(got, "source", "full_outer").where(
        F.coalesce("n_expect", F.lit(-1)) != F.coalesce("n_got", F.lit(-2))
    )
    assert diff.count() == 0


def test_mmr_picks_are_distinct_and_relevance_led(spark, sf_dir):
    rows = m.mmr_diverse_topk(spark, sf_dir).orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == 3 and 0 not in ids  # distinct, never the query
    # rank 1 is the pure-relevance argmax: no other pick beats it
    assert all(rows[0].relevance >= r.relevance for r in rows[1:])


def test_kmeans_purity_is_a_valid_majority_share(spark, sf_dir):
    out = m.kmeans_label_purity(spark, sf_dir).cache()
    emb = read_table(spark, sf_dir, "embeddings")
    # cluster sizes partition the corpus
    assert out.agg(F.sum("cluster_size")).first()[0] == emb.count()
    # purity in (0, 1]; majority label exists in the fixture's label set
    assert out.where((F.col("purity") <= 0) | (F.col("purity") > 1)).count() == 0
    labels = {r.label for r in emb.select("label").distinct().collect()}
    assert {r.majority_label for r in out.collect()} <= labels


def test_incremental_dedup_recrawls_are_exact_dups(spark, sf_dir):
    out = m.incremental_corpus_dedup(spark, sf_dir).cache()
    # every simulated re-crawl row (id >= offset) must flag exact_dup:
    # its text IS in the corpus by construction
    recrawl = out.where(F.col("doc_id") >= m._RECRAWL_ID_OFFSET)
    assert recrawl.count() > 0
    assert recrawl.where(~F.col("exact_dup")).count() == 0
    # an exact dup implies a head dup (same text -> same head)
    assert out.where(F.col("exact_dup") & ~F.col("head_dup")).count() == 0
    # verdict is exactly the OR of the flags
    assert (
        out.where(
            (F.col("verdict") == "drop")
            != (F.col("exact_dup") | F.col("head_dup"))
        ).count()
        == 0
    )


def test_k_anonymity_risk_share_matches_flags(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import etl_ops

    out = etl_ops.k_anonymity_audit(spark, sf_dir).cache()
    cust = read_table(spark, sf_dir, "customer")
    # cells partition the table
    assert out.agg(F.sum("cell_size")).first()[0] == cust.count()
    # below_k is exactly cell_size < k
    assert out.where(F.col("below_k") != (F.col("cell_size") < etl_ops._K_ANON)).count() == 0
    # the published share equals the recomputed ratio on the collected frame
    rows = out.collect()
    at_risk = sum(r.cell_size for r in rows if r.below_k)
    total = sum(r.cell_size for r in rows)
    assert abs(rows[0].at_risk_share - round(at_risk / total, 6)) < 1e-9


def test_quota_sample_is_exact_and_within_one_seat(spark, sf_dir):
    out = m.proportional_quota_sample(spark, sf_dir).cache()
    docs = read_table(spark, sf_dir, "documents")
    # exactly M rows total
    assert out.count() == m._QUOTA_TOTAL
    # largest-remainder property: every source's quota is floor or ceil
    # of its ideal share M * n_s / N
    counts = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    quotas = {r.source: r.quota for r in out.select("source", "quota").distinct().collect()}
    for s, q in quotas.items():
        ideal = m._QUOTA_TOTAL * counts[s] / total
        assert q in (int(ideal), int(ideal) + 1), (s, q, ideal)
    # each source delivers exactly its quota (no short strata in fixture)
    per = out.groupBy("source").agg(F.count("*").alias("n"), F.max("quota").alias("q"))
    assert per.where(F.col("n") != F.col("q")).count() == 0


def test_source_overlap_is_symmetric_half_and_bounded(spark, sf_dir):
    out = m.source_overlap_matrix(spark, sf_dir).cache()
    # only the upper triangle appears, coefficients in (0, 1]
    assert out.where(F.col("source_a") >= F.col("source_b")).count() == 0
    assert out.where((F.col("overlap_coeff") <= 0) | (F.col("overlap_coeff") > 1)).count() == 0
    # every reported pair really shares at least one head fingerprint
    assert out.where(F.col("shared_heads") < 1).count() == 0


def test_write_training_shards_one_sorted_file_per_shard(spark, sf_dir, tmp_path):
    import glob

    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.shards import (
        write_training_shards,
    )

    docs = read_table(spark, sf_dir, "documents")
    draw = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|epoch0")))
    frame = docs.select("doc_id", draw.alias("draw")).withColumn(
        "shard_id",
        (F.conv(F.substring("draw", 1, 15), 16, 10).cast("long") % m.N_SHARDS).cast("int"),
    )
    target = str(tmp_path / "shards")
    write_training_shards(frame, target, m.N_SHARDS)

    total = 0
    for d in sorted(glob.glob(target + "/shard_id=*")):
        files = glob.glob(d + "/*.parquet")
        # the production contract: one sequentially streamable file per shard
        assert len(files) == 1, (d, files)
        import pyarrow.parquet as pq

        t = pq.read_table(files[0]).to_pydict()
        draws = t["draw"]
        assert draws == sorted(draws), f"{d} not draw-sorted"
        total += len(draws)
    assert total == docs.count()  # no row lost or duplicated across shards


def test_packing_efficiency_conserves_tokens(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops4 import (
        PACK_BUDGET,
        sequence_packing,
    )

    out = m.packing_efficiency_report(spark, sf_dir).cache()
    packed = sequence_packing(spark, sf_dir)
    # token mass conserved: report sums what packing assigned
    assert (
        out.agg(F.sum("used_tokens")).first()[0]
        == packed.agg(F.sum("n_tok")).first()[0]
    )
    # padding + used == budget exactly on non-overflow packs; padding is 0 on overflow
    bad = out.where(
        (~F.col("overflow") & (F.col("used_tokens") + F.col("padding_tokens") != PACK_BUDGET))
        | (F.col("overflow") & (F.col("padding_tokens") != 0))
    )
    assert bad.count() == 0


def test_langid_confusion_partitions_the_corpus(spark, sf_dir):
    out = m.langid_confusion_matrix(spark, sf_dir).cache()
    docs = read_table(spark, sf_dir, "documents")
    # cell counts partition the corpus; per-true-class shares sum to 1
    assert out.agg(F.sum("n")).first()[0] == docs.count()
    per_true = out.groupBy("true_lang").agg(F.sum("share_of_true").alias("s"))
    assert per_true.where(F.abs(F.col("s") - 1.0) > 1e-4).count() == 0
    # predictions only come from the heuristic's label set
    assert {r.predicted_lang for r in out.collect()} <= {"en", "und"}


def test_minhash_precision_profile_covers_all_candidates(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    out = m.minhash_candidate_precision(spark, sf_dir).cache()
    docs = read_table(spark, sf_dir, "documents")
    all_cands = minhash_lsh_candidates(docs, "text", "doc_id", verify_threshold=0.0)
    # buckets partition the unfiltered candidate stream
    assert out.agg(F.sum("n_pairs")).first()[0] == all_cands.count()
    # shares sum to 1; passes_verify is exactly decile >= 5
    assert abs(out.agg(F.sum("share")).first()[0] - 1.0) < 1e-4
    assert out.where(F.col("passes_verify") != (F.col("jaccard_decile") >= 5)).count() == 0
    # the pairs that pass equal the registered dedup query's output count
    n_verified = minhash_lsh_candidates(docs, "text", "doc_id").count()
    n_pass = out.where("passes_verify").agg(F.sum("n_pairs")).first()[0]
    assert n_pass == n_verified


def test_results_invariant_to_shuffle_partition_count(spark, sf_dir):
    """Determinism under re-partitioning: the draw/ranking queries must
    return the SAME rows at any parallelism (a global-window or
    unordered-limit bug would surface here as a partition-count-sensitive
    result). Runs the order-sensitive names at 3 shuffle partitions and
    compares canonical rows against the suite's default (32)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parity import canon_rows

    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import rag

    names = [
        ("training_shard_export", m.training_shard_export),
        ("proportional_quota_sample", m.proportional_quota_sample),
        ("mmr_diverse_topk", m.mmr_diverse_topk),
        ("bm25_retrieval", rag.bm25_retrieval),
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = {n: canon_rows(fn(spark, sf_dir).toPandas()) for n, fn in names}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for n, fn in names:
            got = canon_rows(fn(spark, sf_dir).toPandas())
            assert got == baseline[n], f"{n} changed under 3 shuffle partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()


@pytest.mark.slow  # cap-sized plan stress (~11 s)
def test_mmr_unroll_capped_and_analyzable_at_cap(spark):
    """_mmr_picks refuses k beyond the documented cap (each pick embeds
    every prior pick's plan, so plan size is EXPONENTIAL in k — a
    Catalyst-analysis time bomb), and at the cap itself the FULL unrolled
    plan still analyzes in bounded time."""
    import time

    import pytest as _pytest

    rows = [(i, [i + j for j in range(4)], 30 + i, 1.0 - i * 0.01) for i in range(20)]
    shortlist = spark.createDataFrame(
        rows, "vec_id long, qv array<long>, nrm long, rel double"
    ).localCheckpoint(eager=True)

    with _pytest.raises(ValueError, match="capped"):
        m._mmr_picks(shortlist, m._MMR_MAX_K + 1)

    t0 = time.monotonic()
    picks = m._mmr_picks(shortlist, m._MMR_MAX_K)
    # force full analysis + optimization of the deepest (last) pick
    picks[-1]._jdf.queryExecution().optimizedPlan()
    elapsed = time.monotonic() - t0
    assert elapsed < 60.0, f"analysis at k={m._MMR_MAX_K} took {elapsed:.1f}s"


@pytest.mark.slow  # equivalence stress vs unrolled plan (~75 s)
def test_mmr_collected_rerank_matches_unrolled(spark, sf_dir):
    """The driver-side exact rerank (the above-cap path) makes the same
    picks as the plan unroll for every overlapping k, and the dispatcher
    serves k beyond the cap without error — greedy MMR is prefix-stable,
    so the above-cap result must extend the at-cap result."""
    shortlist = m._mmr_shortlist(spark, sf_dir)

    def picks_of(df):
        return [
            (r["rank"], r["vec_id"], round(r["relevance"], 6))
            for r in df.orderBy("rank").collect()
        ]

    for k in (1, 3, 5):
        assert picks_of(m.mmr_rerank_collected(shortlist, k)) == picks_of(
            m.mmr_topk_from_shortlist(shortlist, k)
        ), f"collected rerank diverged from the unrolled plan at k={k}"

    n_short = shortlist.count()
    k_big = m._MMR_MAX_K + 2
    big = picks_of(m.mmr_topk_from_shortlist(shortlist, k_big))  # no raise
    assert len(big) == min(k_big, n_short)
    assert len({vec_id for _, vec_id, _ in big}) == len(big)
    at_cap = picks_of(m.mmr_topk_from_shortlist(shortlist, m._MMR_MAX_K))
    assert big[: len(at_cap)] == at_cap
