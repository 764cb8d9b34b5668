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
from ..operators.linkage import blocked_levenshtein_pairs, jaro_winkler_pairs
from ..session import tune
from ..sources import read_table


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance linkage: same-type part pairs whose names are ≤ 4
    edits apart. The length-band prefilter inside the operator prunes
    pairs before the O(len²) kernel (exact bound, not a heuristic)."""
    tune(spark)
    part = read_table(spark, sf_dir, "part")
    return blocked_levenshtein_pairs(
        part, "p_name", "p_partkey", "p_type", max_dist=4
    )


FUZZY_NAME_PAIRS_ORACLE = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev_dist
FROM part a JOIN part b
  ON a.p_type = b.p_type AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
"""


def jaro_winkler_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler linkage (Spark lacks the builtin → Arrow-batched
    pandas UDF, value-exact vs DuckDB's jaro_winkler_similarity)."""
    tune(spark)
    part = read_table(spark, sf_dir, "part")
    return jaro_winkler_pairs(
        part, "p_name", "p_partkey", "p_type", threshold=0.88
    )


JARO_WINKLER_ORACLE = """
SELECT id_a, id_b, jw_sim FROM (
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw_sim
    FROM part a JOIN part b
      ON a.p_type = b.p_type AND a.p_partkey < b.p_partkey
) WHERE jw_sim >= 0.88
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


REGISTRY = [
    ("fuzzy_name_pairs", fuzzy_name_pairs, FUZZY_NAME_PAIRS_ORACLE),
    ("jaro_winkler_linkage", jaro_winkler_linkage, JARO_WINKLER_ORACLE),
    ("token_sort_clusters", token_sort_clusters, TOKEN_SORT_ORACLE),
    (
        "consonant_skeleton_blocking",
        consonant_skeleton_blocking,
        CONSONANT_SKELETON_ORACLE,
    ),
]
