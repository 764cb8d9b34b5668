"""Iterative graph operators over DataFrames.

The reference has no graph processing; these extend the engine the same way
``operators/components.py`` does — transitive/iterative structure expressed
as a loop of equality-shuffle joins and map-side-combinable aggregates, the
only shapes that survive 100 TB edge tables.

- :func:`pagerank` — fixed-iteration weighted PageRank. A *fixed* iteration
  count (rather than convergence polling) keeps the operator deterministic
  and oracle-checkable: the DuckDB twin unrolls the same iterations as
  chained CTEs, so every intermediate rank is bit-comparable.

Scale notes: each iteration is one shuffle join (ranks ⋈ edges on src) plus
one groupBy(dst) sum — both partial-aggregated map-side. The edge table is
``localCheckpoint``-ed once with its out-weight totals attached, so every
iteration rescans a materialized, already-partitioned edge list instead of
re-deriving it; the rank frame is checkpointed per round so the Catalyst
plan stays O(1) deep (re-analysis of an N-round chained plan is
superlinear — the same reason the reference breaks lineage with a staging
write, OUTBOUND.py:227-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import eager_checkpoint


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    symmetric: bool = False,
) -> DataFrame:
    """Weighted PageRank with ``iterations`` fixed rounds.

    r_0(v) = 1;  r_{k+1}(v) = (1-d) + d * Σ_{(u,v)∈E} r_k(u) · w(u,v)/W(u)

    where W(u) is u's total out-weight. ``symmetric=True`` mirrors every
    edge first (undirected graph) — this also guarantees no dangling nodes,
    so no redistribution term is needed and the oracle SQL stays a plain
    join-aggregate per round. Returns (node, pagerank double).
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        (F.col(weight_col) if weight_col else F.lit(1.0)).cast("double").alias("w"),
    )
    if symmetric:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    out_w = e.groupBy("src").agg(F.sum("w").alias("w_out"))
    # one materialized edge list reused by every round, contribution
    # fraction precomputed so the loop body is join + sum only
    contrib_edges = eager_checkpoint(
        e.join(out_w, "src").select(
            "src", "dst", (F.col("w") / F.col("w_out")).alias("frac")
        ),
        "pagerank_edges",
    )

    ranks = eager_checkpoint(
        contrib_edges.select(F.col("src").alias("node"))
        .union(contrib_edges.select(F.col("dst").alias("node")))
        .distinct()
        .select("node", F.lit(1.0).alias("rank")),
        "pagerank_ranks_init",
    )
    for _ in range(iterations):
        incoming = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("mass"))
        )
        # left join keeps in-degree-0 nodes at the teleport floor (with
        # symmetric edges every node has in-edges and this is a no-op)
        ranks = eager_checkpoint(
            ranks.select("node")
            .join(incoming, ranks.node == incoming.dst, "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            ),
            "pagerank_ranks_round",
        )
    return ranks.select("node", F.col("rank").alias("pagerank"))
