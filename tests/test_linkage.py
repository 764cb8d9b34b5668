"""Record-linkage operators: the JW kernel is pinned value-exact against
DuckDB (it has the builtin; Spark does not), and the levenshtein band
prefilter is pinned as exact (never drops a qualifying pair)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.linkage import (
    blocked_levenshtein_pairs,
    jaro_winkler,
    jaro_winkler_pairs,
)


def test_jaro_winkler_kernel_matches_duckdb(duck):
    random.seed(7)
    words = [
        "small ring", "red widget", "blue bolt", "hot gear",
        "martha", "marhta", "dwayne", "duane", "abcd", "dcba",
        "a", "", "ab", "ba",
    ]
    words += [
        "".join(random.choice("abcdef ") for _ in range(random.randint(1, 12)))
        for _ in range(120)
    ]
    for i, a in enumerate(words):
        for b in words[i:]:
            want = duck.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            assert abs(jaro_winkler(a, b) - want) < 1e-12, (a, b)


def test_levenshtein_band_prefilter_is_exact(spark):
    # pairs whose length gap exceeds max_dist can never be within max_dist
    # edits — verify the banded operator equals the unbanded definition
    rows = [
        (1, "red widget", "t"), (2, "red gadget", "t"), (3, "red", "t"),
        (4, "reddish widgets", "t"), (5, "red widget", "t"),
        (6, "blue bolt", "t"), (7, "bl", "t"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    got = {
        (r.id_a, r.id_b, r.lev_dist)
        for r in blocked_levenshtein_pairs(df, "name", "id", "blk", 4).collect()
    }
    a = df.selectExpr("id id_a", "name name_a", "blk")
    b = df.selectExpr("id id_b", "name name_b", "blk")
    want = {
        (r.id_a, r.id_b, r.d)
        for r in a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("d", F.levenshtein("name_a", "name_b"))
        .where(F.col("d") <= 4)
        .collect()
    }
    assert got == want and (1, 5, 0) in got and (1, 2, 2) in got


def test_jw_pairs_blocked_and_thresholded(spark):
    rows = [
        (1, "red widget", "t"), (2, "red widgel", "t"),
        (3, "unrelated thing", "t"), (4, "red widget", "u"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    got = {(r.id_a, r.id_b): r.jw_sim for r in
           jaro_winkler_pairs(df, "name", "id", "blk", 0.88).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 0.88
    # cross-block pair (1,4) identical but never compared
    assert all(4 not in k for k in got)
    assert all(3 not in k for k in got)


def test_name_level_pairs_conserve_row_pair_counts(spark, sf_dir):
    """The dedupe-before-kernel rewrite must represent EXACTLY the same
    row-pair set: sum(n_pairs) over name pairs == the row-level pair
    count the old O(N²) form produced."""
    import pyspark.sql.functions as F

    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.linkage import (
        fuzzy_name_pairs,
        jaro_winkler_linkage,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.linkage import (
        blocked_levenshtein_pairs,
        jaro_winkler_pairs,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

    part = read_table(spark, sf_dir, "part")
    lev_rows = blocked_levenshtein_pairs(
        part, "p_name", "p_partkey", "p_type", max_dist=4
    ).count()
    lev_agg = (
        fuzzy_name_pairs(spark, sf_dir).agg(F.sum("n_pairs")).first()[0]
    )
    assert lev_agg == lev_rows

    jw_rows = jaro_winkler_pairs(
        part, "p_name", "p_partkey", "p_type", threshold=0.88
    ).count()
    jw_agg = (
        jaro_winkler_linkage(spark, sf_dir).agg(F.sum("n_pairs")).first()[0]
    )
    assert jw_agg == jw_rows


def test_jaro_winkler_null_names_score_zero(spark):
    """NULL names are routine in dirty CRM data: they must score 0.0
    (pair dropped by any threshold) instead of aborting the Arrow worker
    on len(None) — matching DuckDB's NULL-propagating similarity inside
    a >= threshold filter."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.linkage import (
        jaro_winkler,
        jw_similarity,
    )

    assert jaro_winkler(None, "smith") == 0.0
    assert jaro_winkler("smith", None) == 0.0
    df = spark.createDataFrame(
        [("smith", "smyth"), (None, "smith"), ("smith", None)],
        "a string, b string",
    )
    got = df.select(jw_similarity(F.col("a"), F.col("b")).alias("jw")).collect()
    assert got[0].jw > 0.8 and got[1].jw == 0.0 and got[2].jw == 0.0


def test_levenshtein_threshold_bound_keeps_exact_distances(spark):
    """The threshold-bounded kernel returns -1 past the bound; kept rows
    must still carry their TRUE distance and the pair set must equal the
    unbounded filter's."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.linkage import (
        blocked_levenshtein_pairs,
    )

    rows = [
        (1, "jonathan", "j"),
        (2, "jonathon", "j"),   # dist 1 from jonathan
        (3, "jon", "j"),        # dist 5 from jonathan — over max_dist
        (4, "jonatham", "j"),   # dist 1 from jonathan, 2 from jonathon
    ]
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    got = {
        (r.id_a, r.id_b): r.lev_dist
        for r in blocked_levenshtein_pairs(
            df, "name", "id", block_col="blk", max_dist=2
        ).collect()
    }
    assert got == {(1, 2): 1, (1, 4): 1, (2, 4): 2}


def test_length_banded_pairs_equal_all_pairs(spark, sf_dir):
    """The length-banded EQUI-join pair generator is pinned pair-set-equal
    to the all-pairs theta-join it swaps in for — on the real fixture
    vocabulary AND a crafted set exercising every band offset (0/1/2),
    duplicate-length clusters, and names just past the band."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.linkage import (
        length_banded_levenshtein_pairs,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.parquet import (
        read_table,
    )

    crafted = spark.createDataFrame(
        [("abc",), ("abd",), ("abcd",), ("abcde",), ("abcdef",),
         ("zzzzz",), ("ab",), ("x",), ("xy",), ("xyz",)],
        "nm string",
    )
    fixture = (
        read_table(spark, sf_dir, "part").select(F.col("p_name").alias("nm")).distinct()
    )
    for names in (crafted, fixture):
        got = {
            (r.name_a, r.name_b, r.lev_dist)
            for r in length_banded_levenshtein_pairs(names, "nm", 2).collect()
        }
        a = names.select(F.col("nm").alias("name_a"))
        b = names.select(F.col("nm").alias("name_b"))
        want = {
            (r.name_a, r.name_b, r.d)
            for r in a.join(b, F.col("name_a") < F.col("name_b"))
            .withColumn("d", F.levenshtein("name_a", "name_b"))
            .where(F.col("d") <= 2)
            .collect()
        }
        assert got == want and len(got) > 0


def test_entity_resolution_blocked_path_equals_exact(spark, sf_dir):
    """entity_resolution_pipeline resolves IDENTICAL entities on both
    sides of the vocabulary dial: threshold 0 forces the length-banded
    blocked edge stage, the default keeps the broadcast all-pairs stage —
    the dial is performance-only, pinned here so the gate row can never
    drift with the threshold."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.linkage import (
        entity_resolution_pipeline,
    )

    def key(df):
        return {
            (r.master_name, r.n_names, r.n_rows, r.master_partkey, r.retail_cents)
            for r in df.collect()
        }

    exact = key(entity_resolution_pipeline(spark, sf_dir))
    blocked = key(
        entity_resolution_pipeline(spark, sf_dir, blocked_vocab_threshold=0)
    )
    assert exact == blocked and len(exact) > 0
