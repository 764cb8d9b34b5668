"""Edge-case suite for the waterfall fallback_join operator — SURVEY.md §7
flags it as the reference's most distinctive semantics and lists exactly
these hazards: ties on the order column, all-null keys, default-row
stamping, and tier attribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators import (
    FallbackTier,
    fallback_join,
)


def _run(spark, fact_rows, dim_rows, tiers, defaults):
    fact = spark.createDataFrame(fact_rows, "fid long, k string")
    dim = spark.createDataFrame(dim_rows, "dk string, dval string, prio long")
    return {
        r.fid: (r.dval, r.matched_tier, r.prio)
        for r in fallback_join(
            fact,
            dim,
            tiers,
            order_cols=[F.col("prio").desc(), F.col("dval").desc()],
            defaults={
                "dk": F.lit(defaults[0]),
                "dval": F.lit(defaults[1]),
                "prio": F.lit(-1).cast("long"),
            },
            matched_probe="dval",
            tier_col="matched_tier",
        ).collect()
    }


def _tiers():
    return [
        FallbackTier(
            condition=lambda f, d: f["k"] == d["dk"],
            dim_filter=F.col("prio") >= 10,
            name="strict",
        ),
        FallbackTier(condition=lambda f, d: f["k"] == d["dk"], name="loose"),
    ]


def test_tie_on_order_col_breaks_deterministically(spark):
    # two dim rows with identical prio: the dval-desc tiebreaker must pick 'z'
    out = _run(
        spark,
        [(1, "a")],
        [("a", "m", 10), ("a", "z", 10)],
        _tiers(),
        ("NA", "NA"),
    )
    assert out[1] == ("z", "strict", 10)


def test_all_null_fact_keys_fall_through_to_defaults(spark):
    out = _run(
        spark,
        [(1, None), (2, None)],
        [("a", "m", 10)],
        _tiers(),
        ("9967", "DEFAULT"),
    )
    assert out[1] == ("DEFAULT", "default", -1)
    assert out[2] == ("DEFAULT", "default", -1)


def test_tier_cascade_and_attribution(spark):
    # 'a' matches tier1 (prio>=10); 'b' only tier2; 'c' never
    out = _run(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        [("a", "m", 10), ("b", "n", 5)],
        _tiers(),
        ("NA", "NA"),
    )
    assert out[1] == ("m", "strict", 10)
    assert out[2] == ("n", "loose", 5)
    assert out[3] == ("NA", "default", -1)


def test_no_fanout_one_row_per_fact_key(spark):
    # dim has 3 candidates for 'a' in each tier — output must stay 1 row
    fact_rows = [(1, "a"), (2, "a")]
    dim_rows = [("a", "x", 10), ("a", "y", 11), ("a", "z", 12)]
    fact = spark.createDataFrame(fact_rows, "fid long, k string")
    dim = spark.createDataFrame(dim_rows, "dk string, dval string, prio long")
    out = fallback_join(
        fact,
        dim,
        _tiers(),
        order_cols=[F.col("prio").desc(), F.col("dval").desc()],
        defaults={
            "dk": F.lit("NA"),
            "dval": F.lit("NA"),
            "prio": F.lit(-1).cast("long"),
        },
        matched_probe="dval",
    ).collect()
    assert len(out) == 2
    assert {r.dval for r in out} == {"z"}  # highest prio candidate


def test_duplicate_dim_rows_deduped_before_join(spark):
    # the reference's `select distinct *` semantics: dup dim rows must not
    # double anything
    out = _run(
        spark,
        [(1, "a")],
        [("a", "m", 10), ("a", "m", 10), ("a", "m", 10)],
        _tiers(),
        ("NA", "NA"),
    )
    assert out[1] == ("m", "strict", 10)


def test_empty_dim_all_defaults(spark):
    fact = spark.createDataFrame([(1, "a")], "fid long, k string")
    dim = spark.createDataFrame([], "dk string, dval string, prio long")
    out = fallback_join(
        fact,
        dim,
        _tiers(),
        order_cols=[F.col("prio").desc()],
        defaults={
            "dk": F.lit("NA"),
            "dval": F.lit("NA"),
            "prio": F.lit(-1).cast("long"),
        },
        matched_probe="dval",
        tier_col="matched_tier",
    ).collect()
    assert len(out) == 1 and out[0].matched_tier == "default"


def test_equi_fast_path_matches_generic(spark):
    fact_rows = [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, "a")]
    dim_rows = [
        ("a", "A1", 20), ("a", "A2", 20), ("a", "A0", 5),
        ("b", "B1", 3), ("x", "X1", 99),
    ]
    fact = spark.createDataFrame(fact_rows, "fid long, k string")
    dim = spark.createDataFrame(dim_rows, "dk string, dval string, prio long")
    kw = dict(
        order_cols=[F.col("prio").desc(), F.col("dval").desc()],
        defaults={
            "dk": F.lit("d"), "dval": F.lit("D"), "prio": F.lit(-1).cast("long"),
        },
        matched_probe="dval",
        tier_col="matched_tier",
    )
    generic = sorted(
        map(tuple, fallback_join(fact, dim, _tiers(), **kw).collect())
    )
    fast_tiers = [
        FallbackTier(
            condition=lambda f, d: f["k"] == d["dk"],
            dim_filter=F.col("prio") >= 10,
            name="strict",
            equi_on=("k", "dk"),
        ),
        FallbackTier(
            condition=lambda f, d: f["k"] == d["dk"],
            name="loose",
            equi_on=("k", "dk"),
        ),
    ]
    fast = sorted(map(tuple, fallback_join(fact, dim, fast_tiers, **kw).collect()))
    assert generic == fast and len(fast) == len(fact_rows)
