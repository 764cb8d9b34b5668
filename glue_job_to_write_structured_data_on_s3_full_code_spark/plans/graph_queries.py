"""Graph queries: iterative PageRank over the order fact graph.

The reference never does graph work; this extends the engine's iterative
family (connected components in ``operators/components.py``) with a
rank-propagation loop whose fixed iteration count makes it fully
oracle-checkable — the DuckDB twin unrolls the same three rounds as
chained CTEs, so this is a *hash-verified iterative algorithm*, not a
rows-only check.

Graph: customers and suppliers are nodes; an undirected edge (C<custkey>,
S<suppkey>) weighted by the number of lineitems they share. At 100 TB the
edge build is one fact-table aggregation; each PageRank round is one
equality-shuffle join plus a map-side-combined sum (see operators/graph.py
scale notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank
from ..session import tune
from ..sources import read_table

_ITERATIONS = 3
_DAMPING = 0.85


def supplier_customer_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
    pr = pagerank(
        edges,
        weight_col="w",
        iterations=_ITERATIONS,
        damping=_DAMPING,
        symmetric=True,
    )
    return pr.select("node", F.round("pagerank", 6).alias("pagerank"))


def _pagerank_oracle(iterations: int = _ITERATIONS, damping: float = _DAMPING) -> str:
    teleport = round(1.0 - damping, 6)
    rounds = []
    prev = "r0"
    for k in range(1, iterations + 1):
        rounds.append(
            f"""r{k} AS (
    SELECT c.dst AS node,
           CAST({teleport} AS DOUBLE)
             + CAST({damping} AS DOUBLE) * sum(r.rank * c.frac) AS rank
    FROM contrib c JOIN {prev} r ON c.src = r.node
    GROUP BY 1
)"""
        )
        prev = f"r{k}"
    rounds_sql = ", ".join(rounds)
    return f"""
WITH edges AS (
    SELECT 'C' || CAST(o_custkey AS VARCHAR) AS src,
           'S' || CAST(l_suppkey AS VARCHAR) AS dst,
           CAST(count(*) AS DOUBLE) AS w
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
), sym AS (
    SELECT src, dst, w FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst, w FROM edges
), outw AS (
    SELECT src, sum(w) AS w_out FROM sym GROUP BY 1
), contrib AS (
    SELECT s.src, s.dst, s.w / o.w_out AS frac
    FROM sym s JOIN outw o ON s.src = o.src
), r0 AS (
    SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS rank FROM sym
), {rounds_sql}
SELECT node, round(rank, 6) AS pagerank FROM {prev}
"""


PAGERANK_ORACLE = _pagerank_oracle()

REGISTRY = [
    ("supplier_customer_pagerank", supplier_customer_pagerank, PAGERANK_ORACLE),
]
