"""Waterfall fallback-join query — reference J4+J5 (FULL.py:738-942) via the
reusable :func:`..operators.fallback_join` operator, with a DuckDB oracle
replicating the cascade as CTEs.

Tier layout mirrors the reference's dealer lookup: same dim, progressively
looser restriction, defaults for the never-matched (FULL.py:905-907,
``mulcode='9967', forcode='95'``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import FallbackTier, fallback_join
from ..session import tune
from ..sources import read_table

FACT_KEY = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]


def waterfall_fallback_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sup_key"),
        "s_name",
        F.col("s_acctbal").alias("sup_acctbal"),
    )
    tiers = [
        FallbackTier(
            condition=lambda f, d: f["l_suppkey"] == d["sup_key"],
            dim_filter=F.col("sup_acctbal") >= 5000,
            name="premium",
            equi_on=("l_suppkey", "sup_key"),
        ),
        FallbackTier(
            condition=lambda f, d: f["l_suppkey"] == d["sup_key"],
            dim_filter=F.col("sup_acctbal") >= 0,
            name="standard",
            equi_on=("l_suppkey", "sup_key"),
        ),
    ]
    out = fallback_join(
        li,
        sup,
        tiers,
        order_cols=[F.col("sup_acctbal").desc(), F.col("sup_key").desc()],
        defaults={
            "sup_key": F.lit(-1).cast("long"),
            "s_name": F.lit("NA"),
            "sup_acctbal": F.lit(0.0),
        },
        matched_probe="s_name",
        tier_col="matched_tier",
    )
    return out.select(*FACT_KEY, "sup_key", "s_name", "sup_acctbal", "matched_tier")


WATERFALL_ORACLE = """
-- Per-fact-ROW semantics: each lineitem row keeps its own best match, so
-- the ordering (dim-only columns) reduces to a per-join-key top-1 of the
-- dim followed by a plain 1:1 left join. Duplicate fact rows (sf0.001 has
-- one duplicated (orderkey,linenumber,partkey,suppkey) tuple) survive.
WITH dim AS (
    SELECT DISTINCT s_suppkey AS sup_key, s_name, s_acctbal AS sup_acctbal
    FROM supplier
),
d1 AS (
    SELECT * FROM dim WHERE sup_acctbal >= 5000
    QUALIFY row_number() OVER (
        PARTITION BY sup_key ORDER BY sup_acctbal DESC, sup_key DESC
    ) = 1
),
d2 AS (
    SELECT * FROM dim WHERE sup_acctbal >= 0
    QUALIFY row_number() OVER (
        PARTITION BY sup_key ORDER BY sup_acctbal DESC, sup_key DESC
    ) = 1
),
t1 AS (
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
           d.sup_key, d.s_name, d.sup_acctbal
    FROM lineitem l
    LEFT JOIN d1 d ON l.l_suppkey = d.sup_key
),
m1 AS (SELECT *, 'premium' AS matched_tier FROM t1 WHERE s_name IS NOT NULL),
u1 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM t1 WHERE s_name IS NULL),
t2 AS (
    SELECT u.l_orderkey, u.l_linenumber, u.l_partkey, u.l_suppkey,
           d.sup_key, d.s_name, d.sup_acctbal
    FROM u1 u
    LEFT JOIN d2 d ON u.l_suppkey = d.sup_key
),
m2 AS (SELECT *, 'standard' AS matched_tier FROM t2 WHERE s_name IS NOT NULL),
u2 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM t2 WHERE s_name IS NULL),
def AS (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(-1 AS BIGINT) AS sup_key, 'NA' AS s_name, 0.0 AS sup_acctbal,
           'default' AS matched_tier
    FROM u2
)
SELECT * FROM m1
UNION ALL SELECT * FROM m2
UNION ALL SELECT * FROM def
"""

def waterfall_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL waterfall shape: tiers whose join condition is
    an OR-of-equalities theta predicate (J3 inside J4 — ``dm.mulcode =
    s.mulcode_self OR dm.mulcode = s.acc_dealercode AND dm.forcode =
    s.forcode_self``, FULL.py:747-752, SQL precedence ``a OR (b AND c)``).
    Plans as BroadcastNestedLoopJoin, so the fact side is filtered first —
    never run an unbounded BNLJ (SURVEY.md §7 hard parts)."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("dim_key"),
        F.col("c_name").alias("dim_name"),
        F.col("c_acctbal").alias("dim_acctbal"),
    )
    tiers = [
        FallbackTier(
            # a = b OR (c = d AND e): exact reference precedence
            condition=lambda f, d: (f["o_custkey"] == d["dim_key"])
            | ((f["o_orderkey"] % 1000 == d["dim_key"]) & (d["dim_acctbal"] > 9000)),
            dim_filter=F.col("dim_acctbal") >= 5000,
            name="strict",
        ),
        FallbackTier(
            condition=lambda f, d: f["o_custkey"] == d["dim_key"],
            name="loose",
        ),
    ]
    out = fallback_join(
        orders,
        dim,
        tiers,
        order_cols=[F.col("dim_acctbal").desc(), F.col("dim_key").desc()],
        defaults={
            "dim_key": F.lit(-1).cast("long"),
            "dim_name": F.lit("NA"),
            "dim_acctbal": F.lit(0.0),
        },
        matched_probe="dim_name",
        tier_col="matched_tier",
    )
    return out.select(
        "o_orderkey", "o_custkey", "dim_key", "dim_name", "dim_acctbal", "matched_tier"
    )


WATERFALL_DISJUNCTIVE_ORACLE = """
WITH fact AS (
    SELECT * FROM orders WHERE o_orderkey < 2000
), dim AS (
    SELECT DISTINCT c_custkey AS dim_key, c_name AS dim_name, c_acctbal AS dim_acctbal
    FROM customer
),
t1 AS (
    SELECT f.o_orderkey, f.o_custkey, d.dim_key, d.dim_name, d.dim_acctbal
    FROM fact f
    LEFT JOIN (SELECT * FROM dim WHERE dim_acctbal >= 5000) d
      ON f.o_custkey = d.dim_key
         OR f.o_orderkey % 1000 = d.dim_key AND d.dim_acctbal > 9000
    QUALIFY row_number() OVER (
        PARTITION BY o_orderkey ORDER BY d.dim_acctbal DESC, d.dim_key DESC
    ) = 1
),
m1 AS (SELECT *, 'strict' AS matched_tier FROM t1 WHERE dim_name IS NOT NULL),
u1 AS (SELECT o_orderkey, o_custkey FROM t1 WHERE dim_name IS NULL),
t2 AS (
    SELECT u.o_orderkey, u.o_custkey, d.dim_key, d.dim_name, d.dim_acctbal
    FROM u1 u
    LEFT JOIN dim d ON u.o_custkey = d.dim_key
    QUALIFY row_number() OVER (
        PARTITION BY o_orderkey ORDER BY d.dim_acctbal DESC, d.dim_key DESC
    ) = 1
),
m2 AS (SELECT *, 'loose' AS matched_tier FROM t2 WHERE dim_name IS NOT NULL),
u2 AS (SELECT o_orderkey, o_custkey FROM t2 WHERE dim_name IS NULL),
def AS (
    SELECT o_orderkey, o_custkey, CAST(-1 AS BIGINT) AS dim_key,
           'NA' AS dim_name, 0.0 AS dim_acctbal, 'default' AS matched_tier
    FROM u2
)
SELECT * FROM m1
UNION ALL SELECT * FROM m2
UNION ALL SELECT * FROM def
"""


REGISTRY = [
    ("waterfall_fallback_join", waterfall_fallback_join, WATERFALL_ORACLE),
    ("waterfall_disjunctive_join", waterfall_disjunctive_join, WATERFALL_DISJUNCTIVE_ORACLE),
]
