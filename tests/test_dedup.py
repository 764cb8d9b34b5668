"""MinHash-LSH is rows-only at the driver, so its semantics are pinned
here: planted near-duplicates must surface as verified candidate pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
)


def test_minhash_finds_planted_near_dups(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "sleeps on the warm mat near the old wooden door of the house"
    )
    near = base.replace("warm", "cold")  # one-token edit → high jaccard
    far = "completely different words about databases query engines and shuffles"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base + " extra tail words here")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=16, bands=8, verify_threshold=0.5
    ).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in found, f"planted near-dup not found: {found}"
    assert all(3 not in p for p in found), f"unrelated doc paired: {found}"
    for r in pairs:
        assert r.jaccard >= 0.5


def test_minhash_deterministic(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").limit(100)
    a = sorted(map(tuple, minhash_lsh_candidates(docs, "text", "doc_id").collect()))
    b = sorted(map(tuple, minhash_lsh_candidates(docs, "text", "doc_id").collect()))
    assert a == b


def test_minhash_hash_families_agree(spark, sf_dir):
    """The xxhash64 production fast path and the md5cw oracle mode differ
    only in candidate generation; exact-Jaccard verification makes their
    FINAL pair sets equal whenever every true pair shares >=1 band — which
    holds on the fixture corpus (and is the property the bench's
    minhash_lsh_fast entry relies on)."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    slow = {tuple(r) for r in minhash_lsh_candidates(docs, "text", "doc_id").collect()}
    fast = {
        tuple(r)
        for r in minhash_lsh_candidates(
            docs, "text", "doc_id", hash_family="xxhash64"
        ).collect()
    }
    assert slow == fast
    assert slow, "fixture corpus should contain at least one near-dup pair"


def test_exact_dedup_collapses_copies(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "other text")],
        "doc_id long, text string",
    )
    rows = {r.keep_id: r.n_copies for r in exact_dedup(docs, "text", "doc_id").collect()}
    # normalization collapses case/punct/whitespace → docs 1 and 2 merge
    assert rows == {1: 2, 3: 1}


def test_connected_components_semantics(spark):
    """Path graph 1-2-3, triangle 10-11-12 (+edge 12-10), isolated 99:
    min-label propagation must label each node with its component min."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.components import (
        connected_components,
    )

    nodes = spark.createDataFrame(
        [(n,) for n in [1, 2, 3, 10, 11, 12, 99]], "node bigint"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)], "src bigint, dst bigint"
    )
    got = {
        r.node: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_jaccard_bitset_strategy_matches_postings(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        jaccard_similar_pairs,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").limit(400)
    kw = dict(block_col="source", threshold=0.5)
    a = sorted(
        map(tuple, jaccard_similar_pairs(docs, "text", "doc_id", **kw).collect())
    )
    for strat in ("bitset", "arrow"):
        b = sorted(
            map(
                tuple,
                jaccard_similar_pairs(
                    docs, "text", "doc_id", strategy=strat, **kw
                ).collect(),
            )
        )
        assert a == b, strat
    assert len(a) > 0


def test_jaccard_bitset_unblocked_and_empty_docs(spark):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        jaccard_similar_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, ""),          # empty token set: excluded in both strategies
            (4, "   .,!  "),  # normalizes to empty
            (5, "unrelated words entirely here"),
        ],
        "doc_id long, text string",
    )
    a = sorted(
        map(tuple, jaccard_similar_pairs(docs, "text", "doc_id").collect())
    )
    for strat in ("bitset", "arrow"):
        b = sorted(
            map(
                tuple,
                jaccard_similar_pairs(
                    docs, "text", "doc_id", strategy=strat
                ).collect(),
            )
        )
        assert a == b, strat
        assert {(r[0], r[1]) for r in b} == {(1, 2)}
