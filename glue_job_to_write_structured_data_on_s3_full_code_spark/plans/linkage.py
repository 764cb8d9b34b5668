"""Record-linkage / fuzzy-matching queries (north-star extension; the
reference resolves entities only by exact keys — FULL.py:744-1060's
waterfall — so this pack adds the approximate tier over the `part`
dimension, whose two-word names give realistic fuzzy material).

Blocking key is ``p_type`` everywhere: bounded blocks (~⅙ of the table),
the operator-contract shape for pair generation at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import consonant_skeleton, token_sort_key
from ..session import eager_checkpoint, tune
from ..sources import read_table


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance linkage: same-type name pairs ≤ 4 edits apart, with
    the row-pair multiplicity each name pair represents. Pair generation
    is `operators.linkage.name_pair_candidates` — the dedupe-before-kernel
    move: kernels run on DISTINCT names (O(|V|²) per block; at sf0.1: 64
    names vs 20k rows, ~2k name pairs vs 33M row pairs — the row-level
    form measured 389 s, this one ~1 s). The exact length-band prune
    (|Δlen| ≤ max_dist ⇒ candidate) still cuts the kernel invocations
    before the O(len²) levenshtein."""
    from ..operators.linkage import name_pair_candidates

    tune(spark)
    part = read_table(spark, sf_dir, "part")
    return (
        name_pair_candidates(part, "p_name", "p_type")
        .where(F.abs(F.length("name_a") - F.length("name_b")) <= 4)
        .withColumn("lev_dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("lev_dist") <= 4)
        .select(
            F.col("blk").alias("p_type"),
            "name_a",
            "name_b",
            F.col("lev_dist").cast("int").alias("lev_dist"),
            "n_pairs",
        )
    )


FUZZY_NAME_PAIRS_ORACLE = """
WITH names AS (
    SELECT p_type, p_name, count(*) AS n FROM part GROUP BY 1, 2
)
SELECT a.p_type, a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev_dist,
       CAST(CASE WHEN a.p_name = b.p_name THEN a.n * (a.n - 1) / 2
                 ELSE a.n * b.n END AS BIGINT) AS n_pairs
FROM names a JOIN names b
  ON a.p_type = b.p_type AND a.p_name <= b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
  AND NOT (a.p_name = b.p_name AND a.n < 2)
"""


def jaro_winkler_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler linkage (Spark lacks the builtin → Arrow-batched
    pandas UDF, value-exact vs DuckDB's jaro_winkler_similarity), on the
    dedupe-before-kernel shape: the Python kernel sees each distinct name
    pair ONCE (~2k Arrow rows at sf0.1, was 33M row pairs / 389 s)."""
    from ..operators.linkage import jw_similarity, name_pair_candidates

    tune(spark)
    part = read_table(spark, sf_dir, "part")
    return (
        name_pair_candidates(part, "p_name", "p_type")
        .withColumn("jw_sim", F.round(jw_similarity("name_a", "name_b"), 6))
        .where(F.col("jw_sim") >= 0.88)
        .select(
            F.col("blk").alias("p_type"), "name_a", "name_b", "jw_sim", "n_pairs"
        )
    )


JARO_WINKLER_ORACLE = """
WITH names AS (
    SELECT p_type, p_name, count(*) AS n FROM part GROUP BY 1, 2
)
SELECT p_type, name_a, name_b, jw_sim, n_pairs FROM (
    SELECT a.p_type, a.p_name AS name_a, b.p_name AS name_b,
           round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim,
           CAST(CASE WHEN a.p_name = b.p_name THEN a.n * (a.n - 1) / 2
                     ELSE a.n * b.n END AS BIGINT) AS n_pairs
    FROM names a JOIN names b
      ON a.p_type = b.p_type AND a.p_name <= b.p_name
) WHERE jw_sim >= 0.88 AND n_pairs > 0
"""


def token_sort_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-order-insensitive exact clusters: group parts by their sorted
    token key. The equality tier of fuzzy matching — one groupBy shuffle
    on a short key, no pair generation at all."""
    tune(spark)
    part = read_table(spark, sf_dir, "part")
    return (
        part.withColumn("sort_key", token_sort_key("p_name"))
        .groupBy("sort_key")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("p_name").alias("n_distinct_names"),
            F.min("p_partkey").alias("min_partkey"),
            F.max("p_partkey").alias("max_partkey"),
        )
    )


TOKEN_SORT_ORACLE = """
SELECT array_to_string(
           list_sort(string_split_regex(
               trim(regexp_replace(lower(p_name), '[^a-z0-9]+', ' ', 'g')),
               '\\s+')), ' ') AS sort_key,
       count(*) AS n_parts,
       count(DISTINCT p_name) AS n_distinct_names,
       min(p_partkey) AS min_partkey,
       max(p_partkey) AS max_partkey
FROM part
GROUP BY 1
"""


def consonant_skeleton_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic-ish blocking audit: skeleton key → block sizes. The block
    profile is how a linkage pipeline picks its blocking key (bounded
    blocks = bounded pair work); this materializes that profile."""
    tune(spark)
    part = read_table(spark, sf_dir, "part")
    return (
        part.withColumn("skeleton", consonant_skeleton("p_name"))
        .groupBy("skeleton")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("p_name").alias("n_distinct_names"),
            F.min("p_name").alias("first_name"),
            F.max("p_name").alias("last_name"),
        )
    )


CONSONANT_SKELETON_ORACLE = """
SELECT regexp_replace(lower(p_name), '[aeiou]|[^a-z]', '', 'g') AS skeleton,
       count(*) AS n_parts,
       count(DISTINCT p_name) AS n_distinct_names,
       min(p_name) AS first_name,
       max(p_name) AS last_name
FROM part
GROUP BY 1
"""


def name_pair_candidates_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sub-quadratic blocked-linkage swap-in, surfaced directly: the
    distinct-name candidate pairs (with row-pair multiplicities) that a
    string kernel would run on, blocked by ``p_type``. This is what makes
    large name vocabularies tractable — kernels run O(|V|²) per block,
    never O(N²) rows — and the multiplicity algebra guarantees recall:
    sum(n_pairs) per block == C(rows_in_block, 2) exactly (pinned by
    tests/test_r13_swap_candidates.py), so no row-level pair can escape
    blocking. REGISTERED in the r13 swap (COVERAGE.md shortlist item 3);
    the oracle below replays it exactly in DuckDB."""
    from ..operators.linkage import name_pair_candidates

    tune(spark)
    part = read_table(spark, sf_dir, "part")
    return name_pair_candidates(part, "p_name", "p_type")


NAME_PAIR_CANDIDATES_ORACLE = """
WITH names AS (
    SELECT p_type AS blk, p_name AS name, count(*) AS n
    FROM part GROUP BY 1, 2
)
SELECT a.blk, a.name AS name_a, b.name AS name_b,
       a.n AS n_a, b.n AS n_b,
       CASE WHEN a.name = b.name
            THEN CAST(a.n * (a.n - 1) / 2 AS BIGINT)
            ELSE a.n * b.n END AS n_pairs
FROM names a JOIN names b ON a.blk = b.blk AND a.name <= b.name
WHERE (CASE WHEN a.name = b.name
            THEN CAST(a.n * (a.n - 1) / 2 AS BIGINT)
            ELSE a.n * b.n END) > 0
"""


#: distinct-name count above which entity_resolution_pipeline swaps its
#: all-pairs broadcast edge stage for the length-banded equi-join — the
#: sub-quadratic path that keeps working when the vocabulary no longer
#: fits a broadcast BNLJ. Both paths are pinned pair-set- and
#: entity-set-equal in tests/test_linkage.py, so the threshold is a pure
#: performance dial, never a semantics dial.
_BLOCKED_VOCAB_THRESHOLD = 5_000


def entity_resolution_pipeline(
    spark: SparkSession,
    sf_dir: str,
    blocked_vocab_threshold: int = _BLOCKED_VOCAB_THRESHOLD,
) -> DataFrame:
    """End-to-end entity resolution (the MDM pipeline): name histogram →
    fuzzy match (levenshtein ≤ 2 on DISTINCT names, exact length-band
    prune) → connected components over the name-similarity graph →
    survivorship (golden record per cluster: master name = component
    label, row/name counts, master key, integer-cents retail total).

    Scale shape: the match and clustering run on the BOUNDED distinct-
    name table (dedupe-before-kernel; 64 names here vs 20k rows), with
    the name→row expansion deferred to the final aggregate join. The
    edge stage is chosen by measured vocabulary size: at or below
    ``blocked_vocab_threshold`` distinct names, the all-pairs broadcast
    theta-join (cheapest when one side fits in memory); above it, the
    length-banded EQUI-join
    (:func:`~..operators.linkage.length_banded_levenshtein_pairs`) whose
    length-gap blocking is exact for edit distance — identical edges,
    hash-partitionable plan, no broadcast of an unbounded side. Components
    use the iterative min-label operator (operators/components.py),
    oracled by a recursive CTE."""
    from ..operators.components import connected_components
    from ..operators.linkage import length_banded_levenshtein_pairs

    tune(spark)
    part = read_table(spark, sf_dir, "part")
    # checkpointed: the name histogram feeds the pair join, the node list,
    # AND the survivorship join — one part-scan + agg instead of three
    # (bounded: one row per distinct name)
    names = part.groupBy("p_name").agg(
        F.count("*").alias("n_rows"),
        F.min("p_partkey").alias("min_partkey"),
        F.sum(
            F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("retail_cents"),
    )
    # the vocabulary count rides the checkpoint job as an observed metric
    # (r16): one Spark job materializes the histogram AND answers the
    # edge-stage dial, instead of checkpoint + a follow-up count
    from pyspark.sql import Observation

    vocab_obs = Observation()
    names = eager_checkpoint(
        names.observe(vocab_obs, F.count(F.lit(1)).alias("n_names")),
        "linkage_name_histogram",
    )
    if (vocab_obs.get["n_names"] or 0) > blocked_vocab_threshold:
        edges = length_banded_levenshtein_pairs(
            names.select("p_name"), "p_name", max_dist=2
        ).select("name_a", "name_b")
    else:
        a = names.select(F.col("p_name").alias("name_a"))
        b = names.select(F.col("p_name").alias("name_b"))
        edges = (
            a.join(F.broadcast(b), F.col("name_a") < F.col("name_b"))
            .where(F.abs(F.length("name_a") - F.length("name_b")) <= 2)
            .where(F.levenshtein("name_a", "name_b") <= 2)
        )
    comp = connected_components(
        names.select(F.col("p_name").alias("node")),
        edges,
        src_col="name_a",
        dst_col="name_b",
    )
    return (
        names.join(comp, names["p_name"] == comp["node"])
        .groupBy("component")
        .agg(
            F.count("*").alias("n_names"),
            F.sum("n_rows").alias("n_rows"),
            F.min("min_partkey").alias("master_partkey"),
            F.sum("retail_cents").alias("retail_cents"),
        )
        .select(
            F.col("component").alias("master_name"),
            "n_names",
            "n_rows",
            "master_partkey",
            "retail_cents",
        )
    )


ENTITY_RESOLUTION_ORACLE = """
WITH RECURSIVE names AS (
    SELECT p_name, count(*) AS n_rows, min(p_partkey) AS min_partkey,
           CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS retail_cents
    FROM part GROUP BY 1
), pairs AS (
    SELECT a.p_name AS s, b.p_name AS d
    FROM names a JOIN names b
      ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
), edges AS (
    SELECT s, d FROM pairs UNION SELECT d, s FROM pairs
), reach AS (
    SELECT p_name AS node, p_name AS label FROM names
    UNION
    SELECT e.s AS node, r.label
    FROM edges e JOIN reach r ON e.d = r.node
), comp AS (
    SELECT node, min(label) AS component FROM reach GROUP BY node
)
SELECT c.component AS master_name, count(*) AS n_names,
       CAST(sum(n.n_rows) AS BIGINT) AS n_rows,
       min(n.min_partkey) AS master_partkey,
       CAST(sum(n.retail_cents) AS BIGINT) AS retail_cents
FROM names n JOIN comp c ON n.p_name = c.node
GROUP BY 1
"""


REGISTRY = [
    ("fuzzy_name_pairs", fuzzy_name_pairs, FUZZY_NAME_PAIRS_ORACLE),
    ("entity_resolution_pipeline", entity_resolution_pipeline, ENTITY_RESOLUTION_ORACLE),
    ("jaro_winkler_linkage", jaro_winkler_linkage, JARO_WINKLER_ORACLE),
    ("token_sort_clusters", token_sort_clusters, TOKEN_SORT_ORACLE),
    (
        "consonant_skeleton_blocking",
        consonant_skeleton_blocking,
        CONSONANT_SKELETON_ORACLE,
    ),
    # registered in the r13 swap (COVERAGE.md shortlist item 3): gates the
    # blocking recall contract on the driver's DuckDB hash, not just pytest
    (
        "name_pair_candidates_blocked",
        name_pair_candidates_blocked,
        NAME_PAIR_CANDIDATES_ORACLE,
    ),
]
