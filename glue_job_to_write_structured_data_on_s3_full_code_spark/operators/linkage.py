"""Record-linkage / fuzzy-matching operators (north-star extension beyond
the reference's equality joins — its waterfall join, FULL.py:744-1060,
resolves entities only through exact keys; these operators add the
approximate tier a real-world CRM pipeline needs for dirty names).

All comparison happens inside blocks (equality on a cheap blocking key),
never all-pairs: at 100 TB the blocked self-join shuffles each block to
one task and pair work is Σ block² — the operator contract is that blocks
are bounded (pick blocking keys accordingly), the same contract the dedup
family documents.

- :func:`blocked_levenshtein_pairs` — edit-distance pairs. Pure JVM
  (``F.levenshtein``), with the |len(a)-len(b)| ≤ max_dist band applied
  BEFORE the distance call (edit distance is bounded below by the length
  gap, so the band is exact, not a heuristic).
- :func:`jaro_winkler_pairs` — Jaro-Winkler similarity. Spark has no
  built-in, so scoring is an Arrow-batched pandas UDF implementing the
  standard algorithm (boost threshold 0.7, prefix ≤ 4, p = 0.1) —
  validated value-exact against DuckDB's ``jaro_winkler_similarity``
  across 49k string pairs (tests/test_linkage.py).
- token-sort and consonant-skeleton *keys* live in ``functions/text.py``
  (:func:`..functions.text.token_sort_key`,
  :func:`..functions.text.consonant_skeleton`) — exact groupBy keys, the
  equality tier of fuzzy matching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def blocked_levenshtein_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    block_col: str,
    max_dist: int = 4,
) -> DataFrame:
    """Within-block pairs with edit distance ≤ ``max_dist``.

    Output: ``id_a, id_b, name_a, name_b, lev_dist`` with ``id_a < id_b``.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        F.col(block_col).alias("blk"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        F.col(block_col).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # exact lower bound on edit distance — prunes before the
            # O(len²) levenshtein kernel runs
            & (
                F.abs(F.length("name_a") - F.length("name_b"))
                <= F.lit(max_dist)
            )
        )
        # threshold-bounded kernel (Spark 3.5+): O(len·max_dist) with
        # early exit, returning -1 past the bound — vs the unbounded
        # O(len_a·len_b) DP per length-band-surviving pair; kept rows
        # carry their true distance (-1 only marks over-threshold pairs,
        # which the filter drops)
        .withColumn(
            "lev_dist", F.levenshtein("name_a", "name_b", int(max_dist))
        )
        .where((F.col("lev_dist") >= 0) & (F.col("lev_dist") <= max_dist))
        .select("id_a", "id_b", "name_a", "name_b", "lev_dist")
    )


def _jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3


def jaro_winkler(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler: boost applied only when jaro > 0.7, common
    prefix capped at 4, scaling 0.1 — the same variant DuckDB implements
    (value-exact, see module docstring).

    NULL names score 0.0 (below any sensible threshold → pair dropped),
    matching both DuckDB's NULL-propagating jaro_winkler_similarity
    inside a `>= threshold` filter and the null-safe Levenshtein tier —
    this module is for dirty CRM names, where NULLs are routine, and a
    bare ``len(None)`` would abort the whole job from inside the Arrow
    worker."""
    if s1 is None or s2 is None:
        return 0.0
    j = _jaro(s1, s2)
    if j <= 0.7:
        return j
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)


# typed with DoubleType() (not a DDL string) so importing this module does
# not require an active SparkSession to parse the type
@pandas_udf(DoubleType())
def _jw_udf(a, b):
    import pandas as pd

    return pd.Series(
        [jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
    )


def jw_similarity(a, b) -> F.Column:
    """Public Jaro-Winkler column kernel (Arrow-batched pandas UDF —
    Spark has no builtin). Plans compose THIS, not the private UDF."""
    return _jw_udf(a, b)


def name_pair_candidates(
    df: DataFrame, name_col: str, block_col: str
) -> DataFrame:
    """Dedupe-before-kernel pair generation: distinct within-block name
    pairs (``name_a <= name_b``) with the row-pair multiplicity each one
    represents (``n_a * n_b`` across distinct names, ``C(n, 2)`` within
    an identical name). String kernels run on THIS frame — O(|V|²) per
    block — never on the O(N²) row-pair space; the id-level expansion
    stays a multiplicity-weighted join a consumer may choose to pay.
    Output: ``blk, name_a, name_b, n_a, n_b, n_pairs`` (pairs with zero
    multiplicity — a unique name paired with itself — already dropped).
    """
    names = df.groupBy(block_col, name_col).agg(F.count("*").alias("n"))
    a = names.select(
        F.col(block_col).alias("blk"),
        F.col(name_col).alias("name_a"),
        F.col("n").alias("n_a"),
    )
    b = names.select(
        F.col(block_col).alias("blk"),
        F.col(name_col).alias("name_b"),
        F.col("n").alias("n_b"),
    )
    n_pairs = F.when(
        F.col("name_a") == F.col("name_b"),
        (F.col("n_a") * (F.col("n_a") - 1) / 2).cast("long"),
    ).otherwise(F.col("n_a") * F.col("n_b"))
    return (
        a.join(b, "blk")
        .where(F.col("name_a") <= F.col("name_b"))
        .withColumn("n_pairs", n_pairs)
        .where(F.col("n_pairs") > 0)
    )


def length_banded_levenshtein_pairs(
    df: DataFrame, name_col: str, max_dist: int = 2
) -> DataFrame:
    """EXACT-recall blocked generation of ``levenshtein ≤ max_dist`` pairs
    over a distinct-name table — the sub-quadratic swap-in for the
    all-pairs ``a < b`` theta-join when the vocabulary outgrows a
    broadcast BNLJ.

    Blocking key = string LENGTH: edit distance is bounded below by the
    length gap, so a pair outside the ±``max_dist`` band is PROVABLY a
    non-match — banding by length loses nothing (recall contract pinned
    pair-set-equal to the all-pairs path in tests/test_linkage.py). The
    band join is an EQUI-join (each name probes its own length and the
    ``max_dist`` lengths above via a ``max_dist+1``-way explode), so
    Catalyst plans a hash-partitioned join instead of a broadcast
    nested-loop — shuffle work is Σ (names-of-length-L × band window),
    never |V|², and no side needs to fit in one executor.

    Dedup logic: offset 0 (equal lengths) pairs each unordered couple
    twice and each name with itself → keep ``name_a < name_b``; offsets
    ≥ 1 produce each cross-length couple exactly once (shorter name on
    the a-side). Output is canonically ordered (``name_a`` is the
    lexicographic min) with the true ``lev_dist``.
    """
    a = df.select(F.col(name_col).alias("name_a"))
    b = df.select(F.col(name_col).alias("name_b"))
    probe = a.withColumn(
        "band_len",
        F.explode(
            F.array(*[F.length("name_a") + F.lit(i) for i in range(max_dist + 1)])
        ),
    )
    return (
        probe.join(b, probe["band_len"] == F.length("name_b"))
        .where(
            (F.length("name_a") < F.length("name_b"))
            | (F.col("name_a") < F.col("name_b"))
        )
        .withColumn(
            "lev_dist", F.levenshtein("name_a", "name_b", int(max_dist))
        )
        .where((F.col("lev_dist") >= 0) & (F.col("lev_dist") <= max_dist))
        .select(
            F.least("name_a", "name_b").alias("name_a"),
            F.greatest("name_a", "name_b").alias("name_b"),
            "lev_dist",
        )
    )


def jaro_winkler_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.88,
) -> DataFrame:
    """Within-block pairs with Jaro-Winkler similarity ≥ ``threshold``.

    Pair generation and the final round/threshold are JVM expressions;
    only the scalar JW kernel is Python (Arrow-batched) because Spark has
    no built-in. Output: ``id_a, id_b, jw_sim`` with ``id_a < id_b``.
    """
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        F.col(block_col).alias("blk"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        F.col(block_col).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("jw_sim", F.round(_jw_udf("name_a", "name_b"), 6))
        .where(F.col("jw_sim") >= threshold)
        .select("id_a", "id_b", "jw_sim")
    )
