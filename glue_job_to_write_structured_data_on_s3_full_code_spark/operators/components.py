"""Connected components by iterative min-label propagation — turns
near-duplicate PAIRS (Jaccard / MinHash-LSH / embedding-cosine edges) into
dedup GROUPS: every doc in a component keeps the component's minimum id as
its canonical representative.

Why iterative: transitive closure is not expressible in one SQL pass.
Each round combines ONE-HOP propagation (min over neighbors' labels)
with POINTER JUMPING (adopt my current label's own label — the
Shiloach-Vishkin / large-star move), so the distance a label still has
to travel halves every round: O(log diameter) rounds even for chain
graphs, where plain one-hop propagation needs O(diameter) and would
blow the iteration bound on e.g. a 30-revision near-dup chain. Both
steps are equality-shuffle joins + a min-aggregate, map-side-combinable.

Driver involvement per round is reading one observed metric (the
changed-label count rides the round's own checkpoint job as a
CollectMetrics — no separate probe job), and `localCheckpoint` truncates
the lineage each round so the plan doesn't deepen with iterations
(Catalyst re-analysis of an N-round chained plan is superlinear — same
reason the reference breaks lineage with a staging write,
OUTBOUND.py:227-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
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
    component); `edges` — `src_col`/`dst_col`. Edge endpoints are
    auto-included even when absent from `nodes`: a labeled-nodes-only
    view would both mislabel THROUGH-nodes and — worse — let the
    convergence probe's inner join silently ignore them, declaring
    convergence while two nodes connected through an unlisted endpoint
    still carry different components. Returns (node, component). Raises
    if not converged within `max_iter` rounds (log-diameter bound, see
    module docstring)."""
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
    sym = eager_checkpoint(
        sym.where(F.col("a") != F.col("b")).distinct(), "components_edges"
    )

    base = (
        nodes.select(F.col(node_col).alias("node"))
        # sym is symmetric, so its `a` column covers every endpoint
        .union(sym.select(F.col("a").alias("node")))
        .distinct()
    )
    labels = eager_checkpoint(
        base.select("node", F.col("node").alias("component")),
        "components_labels_init",
    )

    for round_no in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym.b == labels.node
        ).select(F.col("a").alias("node"), "component")
        # pointer jumping: adopt my current component's OWN current label
        # (component values are node ids, and every one is in `labels`
        # by the endpoint-complete init) — this is what turns chain
        # convergence from O(diameter) rounds into O(log diameter).
        # Round 1 skips it (r15): on the identity init every label IS its
        # own node, so the self-join would reproduce `labels` verbatim —
        # one join and one shuffle of pure no-op work.
        candidates = labels.select(
            "node", "component", F.col("component").alias("old_component")
        ).unionByName(
            neighbor_labels.withColumn("old_component", F.lit(None).cast(
                labels.schema["component"].dataType.simpleString()
            ))
        )
        if round_no > 0:
            jumped = (
                labels.alias("l1")
                .join(labels.alias("l2"), F.col("l1.component") == F.col("l2.node"))
                .select(
                    F.col("l1.node").alias("node"),
                    F.col("l2.component").alias("component"),
                    F.lit(None).cast(
                        labels.schema["component"].dataType.simpleString()
                    ).alias("old_component"),
                )
            )
            candidates = candidates.unionByName(jumped)
        # the convergence probe rides the SAME aggregate (r15): the old
        # label travels as a tagged column (unique per node — only the
        # `labels` branch carries it). r16: the changed-count rides the
        # checkpoint JOB itself as an observed metric (CollectMetrics
        # fires when the eager localCheckpoint materializes the round),
        # so each round is ONE Spark job instead of checkpoint + a
        # follow-up count over the checkpoint blocks. NULL-safe exactly
        # like the old `!=` filter: a null old_component contributes 0.
        obs = Observation()
        new_with_old = eager_checkpoint(
            candidates.groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.max("old_component").alias("old_component"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(
                        F.col("component") != F.col("old_component"), 1
                    ).otherwise(0)
                ).alias("changed"),
            ),
            "components_labels_round",
        )
        changed = obs.get["changed"] or 0
        labels = new_with_old.select("node", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
