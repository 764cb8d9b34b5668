"""Connected components by iterative min-label propagation — turns
near-duplicate PAIRS (Jaccard / MinHash-LSH / embedding-cosine edges) into
dedup GROUPS: every doc in a component keeps the component's minimum id as
its canonical representative.

Why iterative: transitive closure is not expressible in one SQL pass, and
at 100 TB the right shape is the classic large-star/small-star family —
each round is one equality-shuffle join + one min-aggregate, both
map-side-combinable, and the number of rounds is O(log(largest component
diameter)), tiny for dedup graphs (near-dup components are shallow).

Driver involvement per round is a single `count()` convergence probe, and
`localCheckpoint` truncates the lineage each round so the plan doesn't
deepen with iterations (Catalyst re-analysis of an N-round chained plan is
superlinear — same reason the reference breaks lineage with a staging
write, OUTBOUND.py:227-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import eager_checkpoint


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with min(node id) of its undirected component.

    `nodes` — one column `node_col` (isolated nodes become their own
    component); `edges` — `src_col`/`dst_col`. Returns (node, component).
    Raises if not converged within `max_iter` rounds (diameter bound).
    """
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    sym = eager_checkpoint(
        sym.where(F.col("a") != F.col("b")).distinct(), "components_edges"
    )

    labels = eager_checkpoint(
        nodes.select(
            F.col(node_col).alias("node"), F.col(node_col).alias("component")
        ),
        "components_labels_init",
    )

    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym.b == labels.node
        ).select(F.col("a").alias("node"), "component")
        new_labels = eager_checkpoint(
            labels.union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component")),
            "components_labels_round",
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
