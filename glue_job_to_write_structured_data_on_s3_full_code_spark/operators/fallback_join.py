"""Waterfall fallback join — the reference's most distinctive operator
(J4+J5, SURVEY.md §2.4).

FULL.py:738-942 (sales branch) and :950-1057 (TV branch) enrich each lead
with a dealer row by trying progressively looser join conditions: join on
the strict key set, split matched/unmatched on the join-result null test
(FULL.py:765-766), re-join only the misses on the next key set, repeat,
and finally stamp default values on whatever is still unmatched
(FULL.py:905-907). Every round keeps the top-1 candidate per fact row via
``row_number() over (partition by leadid order by sallivedate desc)``
(FULL.py:744). The matched tiers are unioned at the end (FULL.py:942).

This module generalizes that cascade into one reusable operator.

Scale design (100 TB fact, small dim — the reference's dealer master is a
lookup table):
- the dim is deduplicated (reference does ``select distinct *``,
  FULL.py:749) and **broadcast**, so each round is a broadcast join with
  no fact-side shuffle;
- each round's input is only the previous round's *misses*, which shrinks
  geometrically — the reference's semantics, and also the efficient plan;
- top-1 per fact ROW is computed on the (small) join fan-out with a window
  keyed by a synthetic row id; ties must be broken by a unique dim column
  for determinism. Enrichment never drops or collapses fact rows — every
  input row yields exactly one output row, even when fact rows duplicate
  each other (the reference partitions its window by ``leadid``, which is
  unique per fact row in its data, so the semantics agree there);
- tiers are combined with ``unionByName`` (the reference's positional
  ``unionAll`` at FULL.py:942 silently relies on column order — SURVEY.md
  §7 flags this; unionByName is the safe equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .top1 import top1_per_group


@dataclass
class FallbackTier:
    """One round of the waterfall.

    ``condition(fact, dim) -> Column`` builds the join predicate (may be an
    OR-of-equalities theta condition like FULL.py:747-752).
    ``dim_filter`` optionally restricts the dim for this round (the
    reference filters ``dealertype in ('S','3S','2S')`` per round,
    FULL.py:749).
    """

    condition: "callable"
    dim_filter: Column | None = None
    name: str = ""
    # For plain equi-tiers (fact_col == dim_col) whose order_cols are
    # dim-only, set equi_on=('fact_col', 'dim_col') to let fallback_join
    # pre-reduce the dim to its top-1 row per join key BEFORE the
    # broadcast join. That removes the per-tier window over the fact —
    # the fact side is never shuffled at all. Leave None for theta/OR
    # conditions or fact-dependent order columns.
    equi_on: tuple[str, str] | None = None


def fallback_join(
    fact: DataFrame,
    dim: DataFrame,
    tiers: list[FallbackTier],
    order_cols: list[Column],
    defaults: dict[str, "Column"],
    matched_probe: str,
    tier_col: str | None = None,
) -> DataFrame:
    """Enrich ``fact`` with columns of ``dim`` via a tiered join cascade.

    Every input fact row yields exactly one output row: per-row top-1 over
    the join fan-out (a window keyed by a synthetic row id), so duplicate
    fact rows are preserved, never collapsed.

    matched_probe : dim column whose non-nullness marks a match
        (the reference probes ``mulcode_dealer is null``, FULL.py:765).
    defaults : values stamped on rows no tier matched (FULL.py:905-907);
        keys must cover every dim column.
    tier_col : optional output column recording which tier matched
        (tier name, or 'default').
    """
    overlap = set(fact.columns) & set(dim.columns)
    if overlap:
        # The inter-tier miss split drops *dim* columns by name; a shared
        # name would silently drop the fact's column too and make the
        # top-1 window key ambiguous. Callers must alias dim columns.
        raise ValueError(
            f"fallback_join: fact and dim share column(s) {sorted(overlap)}; "
            "alias the dim columns before calling"
        )
    dim = dim.distinct()  # reference: select distinct * from dealermaster
    dim_cols = [c for c in dim.columns]

    if all(t.equi_on is not None for t in tiers):
        # All-equi cascade: ONE pass over the fact — each tier's dim is
        # pre-reduced to its top-1 row per key and chained as a broadcast
        # left join; the winning tier per row is a priority when-chain on
        # per-tier match flags. No synthetic row id, no windows over the
        # fact, no union of branches (whose T+1 arms would each recompute
        # the preceding tiers), and nothing to checkpoint. The when-chain
        # keys on the MATCH FLAG, not coalesce of values: a matched
        # tier's NULL payload column must win over a later tier's value.
        from pyspark.sql import Window

        out = fact
        match_flags: list[Column] = []
        for i, tier in enumerate(tiers):
            tier_dim = dim.where(tier.dim_filter) if tier.dim_filter is not None else dim
            fact_col, dim_col = tier.equi_on
            # the per-key top-1 rides the alias projection (r16): one
            # select + one filter instead of top1_per_group's
            # withColumn/where/drop chain plus a second select — each
            # chained op re-analyzes the whole tier subtree. Row-identical:
            # same window, same filter, and the surviving `_t{i}_rn` (
            # constant 1) never reaches the caller — the final projection
            # below selects explicit columns only.
            w = Window.partitionBy(dim_col).orderBy(*order_cols)
            tier_dim = tier_dim.select(
                F.col(dim_col).alias(f"_t{i}_key"),
                *[F.col(c).alias(f"_t{i}_{c}") for c in dim_cols],
                F.row_number().over(w).alias(f"_t{i}_rn"),
            ).where(F.col(f"_t{i}_rn") == 1)
            out = out.join(
                F.broadcast(tier_dim),
                out[fact_col] == tier_dim[f"_t{i}_key"],
                "left",
            )
            match_flags.append(F.col(f"_t{i}_{matched_probe}").isNotNull())

        def pick(values: list[Column], default: Column) -> Column:
            expr = default
            for flag, val in zip(reversed(match_flags), reversed(values)):
                expr = F.when(flag, val).otherwise(expr)
            return expr

        proj = [F.col(c) for c in fact.columns]
        for c in dim_cols:
            proj.append(
                pick(
                    [F.col(f"_t{i}_{c}") for i in range(len(tiers))],
                    defaults[c],
                ).alias(c)
            )
        if tier_col:
            proj.append(
                pick(
                    [
                        F.lit(tier.name or f"tier{i}")
                        for i, tier in enumerate(tiers)
                    ],
                    F.lit("default"),
                ).alias(tier_col)
            )
        return out.select(*proj)

    from ..session import eager_checkpoint

    # Synthetic per-row id: the theta path's top-1 window partitions on it,
    # so two fact rows that happen to share every column still each keep
    # their own best match (the equi fast path preserves them trivially).
    # Checkpointed — with plain lineage each of the T+1 union branches
    # would re-execute every preceding tier's join+window from its own
    # fact scan (O(T²) joins, T+1 fact scans at 100 TB), and
    # monotonically_increasing_id would be re-evaluated per branch, which
    # is only accidentally consistent. Each tier's miss split is likewise
    # materialized, so the cascade is linear in T and the rid is minted
    # exactly once.
    rid = "__fallback_rid"
    remaining = eager_checkpoint(
        fact.withColumn(rid, F.monotonically_increasing_id()),
        "fallback_rid_base",
    )
    matched_parts: list[DataFrame] = []
    for i, tier in enumerate(tiers):
        tier_dim = dim.where(tier.dim_filter) if tier.dim_filter is not None else dim
        if tier.equi_on is not None:
            # Equi fast path: all dim candidates for a fact row share the
            # join key, so the per-fact-row top-1 equals the per-key top-1
            # of the dim. Reducing the (broadcast-sized) dim first makes
            # the tier a plain 1:1 broadcast join — the fact is never
            # shuffled, vs. a fact-wide sort window per tier.
            fact_col, dim_col = tier.equi_on
            tier_dim = top1_per_group(tier_dim, [dim_col], order_cols)
            joined = remaining.join(
                F.broadcast(tier_dim),
                remaining[fact_col] == tier_dim[dim_col],
                "left",
            )
            best = joined
        else:
            joined = remaining.join(
                F.broadcast(tier_dim), tier.condition(remaining, tier_dim), "left"
            )
            best = top1_per_group(joined, [rid], order_cols)
        hit = best.where(F.col(matched_probe).isNotNull())
        if tier_col:
            hit = hit.withColumn(tier_col, F.lit(tier.name or f"tier{i}"))
        matched_parts.append(hit)
        remaining = eager_checkpoint(
            best.where(F.col(matched_probe).isNull()).drop(*dim_cols),
            f"fallback_tier{i}_miss",
        )

    fallback = remaining
    for c in dim_cols:
        fallback = fallback.withColumn(c, defaults[c])
    if tier_col:
        fallback = fallback.withColumn(tier_col, F.lit("default"))
    matched_parts.append(fallback)

    out = matched_parts[0]
    for part in matched_parts[1:]:
        out = out.unionByName(part)
    return out.drop(rid)
