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


def test_connected_components_through_node_and_chain(spark):
    """Two review-confirmed hazards: (a) an edge endpoint absent from
    `nodes` previously let the convergence probe declare victory while
    nodes connected THROUGH it still carried different components;
    (b) plain one-hop propagation needed O(diameter) rounds, so a
    30-revision near-dup chain blew the iteration bound — pointer
    jumping converges it in O(log diameter)."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.components import (
        connected_components,
    )

    # (a) through-node: 1-X-2 where X is not in `nodes`
    nodes = spark.createDataFrame([(1,), (2,)], "node long")
    edges = spark.createDataFrame([(1, 99), (99, 2)], "src long, dst long")
    got = {
        r.node: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert got[1] == got[2] == got[99] == 1

    # (b) chain of 31 nodes: diameter 30 > the old max_iter=25
    chain_nodes = spark.createDataFrame([(i,) for i in range(31)], "node long")
    chain_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    got = {
        r.node: r.component
        for r in connected_components(chain_nodes, chain_edges).collect()
    }
    assert set(got.values()) == {0} and len(got) == 31


def test_jaccard_strategies_agree_on_null_blocks_and_borderline(spark):
    """Cross-strategy identity at its two confirmed cracks: NULL-block
    docs (groupBy keeps the null group, equality joins drop it — all
    strategies must now EXCLUDE them) and a borderline pair whose raw
    jaccard sits just under the threshold but rounds up to meet it (the
    arrow prefilter's old 1e-9 slack dropped it)."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        jaccard_similar_pairs,
    )

    rows = [
        (1, "alpha beta gamma", "en"),     # 3 tokens
        (2, "alpha delta epsilon zeta", "en"),  # 4 tokens, 1 shared -> j=1/6
        (3, "alpha beta gamma", None),     # NULL block
        (4, "alpha beta gamma", None),     # NULL block (identical text)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # round(1/6, 6) = 0.166667 >= 0.166667 — kept only via round-up
    thr = 0.166667
    results = {}
    for strategy in ("postings", "bitset", "arrow"):
        pairs = sorted(
            (r.doc_a, r.doc_b)
            for r in jaccard_similar_pairs(
                df, "text", "doc_id", block_col="lang",
                threshold=thr, strategy=strategy,
            ).collect()
        )
        results[strategy] = pairs
    assert results["postings"] == results["bitset"] == results["arrow"]
    assert (1, 2) in results["postings"]       # borderline pair kept
    assert (3, 4) not in results["postings"]   # NULL-block docs excluded


def test_simhash_rejects_unsupported_widths(spark):
    """md5 hex has 32 nibbles: bits > 32 would silently emit constant-'0'
    tail bits (32 bits of signal masquerading as more)."""
    import pytest

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bits must be in"):
        from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import simhash

        simhash(df, "text", "doc_id", bits=64)
