"""The capstone training-data pipeline: one query chaining the engine's
curation primitives end-to-end — curate → dedup (exact + head) → per-source
token-budget mix → deterministic shard export → per-shard manifest/eval —
the full "raw crawl to trainer-ready shards" last mile in a single plan,
stressing deep-plan analysis the way ``deep_prospect_pipeline`` does for
the reference-shaped side.

Stage semantics reuse the already-oracled primitives verbatim (same
normalizations, same md5 draws, same budget rule), so the composed DuckDB
oracle is their CTE composition:

1. **curate** — ``corpus_curation_pipeline`` gate (llm_ops2.py): lang
   filter pushed into the scan, token-count window [20, 90], type-token
   ratio ≥ 0.35, exact dedup on the normalized-text fingerprint (min
   doc_id wins), deterministic train split (md5 bucket < 'd3').
2. **head dedup** — the ``incremental_corpus_dedup`` head-fingerprint
   (first 30 normalized tokens): catches tail-edited re-crawls exact
   dedup misses; min doc_id per head wins.
3. **mix** — ``token_budget_mix`` rule: docs ordered by an md5 draw per
   source, kept while the inclusive token cumsum fits the budget.
4. **shard** — ``training_shard_export`` rule: shard = 60-bit md5 mod
   N_SHARDS, position-in-shard by a second draw (the epoch shuffle).
5. **manifest/eval** — per-shard audit a trainer consumes before reading
   a single shard: doc/token counts, source diversity, mean quality
   (type-token ratio), token share vs the ideal 1/N balance, and the
   first doc per shard (pins the epoch-shuffle order in the gate hash).

Scale shape (100 TB): stages 1–2 are map-side until their dedup windows,
whose keys are content fingerprints (cardinality ≈ distinct docs, no
skew); stage 3's window is keyed by source — the one low-cardinality key,
extended to (source, shard) at scale exactly as token_budget_mix
documents; stage 4 shuffles once on shard_id (uniform by construction);
stage 5 aggregates N_SHARDS rows. One scan of documents feeds the whole
chain — no joins, no cartesian, nothing driver-side.

Reference parity: the reference (FULL.py, a CRM ETL job) has no training
export; this is north-star extension material on the synthetic
``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, normalized_text, tokens
from ..session import tune
from ..sources import read_table
from .llm_ops6 import N_SHARDS, TOKEN_BUDGET, _head_key


def corpus_to_shards_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curate → dedup → mix → shard → manifest in one plan (see module
    docstring for the stage contracts and scale shape)."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")

    # stage 1: curation gate + exact fingerprint dedup + train split
    toks = tokens(normalized_text("text"))
    n_toks = F.size(toks)
    ttr = F.round(F.size(F.array_distinct(toks)) / n_toks, 6)
    quality = (
        docs.where(F.col("lang") == "en")
        .withColumn("n_tokens", n_toks)
        .withColumn("ttr", ttr)
        .where((F.col("n_tokens").between(20, 90)) & (F.col("ttr") >= 0.35))
        .withColumn("fingerprint", doc_fingerprint("text"))
        .withColumn("head_fp", F.md5(_head_key("text")))
    )
    w_fp = Window.partitionBy("fingerprint").orderBy("doc_id")
    curated = (
        quality.withColumn("rn", F.row_number().over(w_fp))
        .where(F.col("rn") == 1)
        .where(F.expr("substring(md5(cast(doc_id as string)), 1, 2)") < "d3")
        .drop("rn")
    )

    # stage 2: head-fingerprint dedup (tail-edited re-crawl catcher)
    w_head = Window.partitionBy("head_fp").orderBy("doc_id")
    head_deduped = (
        curated.withColumn("rn", F.row_number().over(w_head))
        .where(F.col("rn") == 1)
        .drop("rn")
    )

    # stage 3: per-source token-budget mix (uniform md5-draw prefix)
    draw = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|capstone-mix")))
    w_src = (
        Window.partitionBy("source")
        .orderBy("draw", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mixed = (
        head_deduped.withColumn("draw", draw)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w_src))
        .where(F.col("cum_tokens") <= TOKEN_BUDGET)
    )

    # stage 4: deterministic shard + epoch-shuffle position
    draw2 = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|epoch0")))
    sharded = mixed.withColumn("draw2", draw2).withColumn(
        "shard_id",
        (F.conv(F.substring("draw2", 1, 15), 16, 10).cast("long") % N_SHARDS)
        .cast("int"),
    )
    w_shard = Window.partitionBy("shard_id").orderBy("draw2", "doc_id")
    positioned = sharded.withColumn("pos_in_shard", F.row_number().over(w_shard))

    # stage 5: per-shard manifest + balance eval (token share vs ideal 1/N)
    # avg_ttr as an exact integer-micro half-up mean: ttr is 6-dp by
    # construction, so the true shard mean can land exactly on a 6-dp
    # half-point where a float avg+round is one summation-order ulp from
    # flipping (the pricing_summary_agg / hourly_buckets discipline)
    manifest = (
        positioned.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.sum(F.round(F.col("ttr") * 1e6).cast("long")).alias("__t"),
            F.max(F.when(F.col("pos_in_shard") == 1, F.col("doc_id"))).alias(
                "first_doc_id"
            ),
        )
        .withColumn(
            "avg_ttr",
            F.expr("(2 * __t + n_docs) DIV (2 * n_docs)").cast("double") / 1e6,
        )
    )
    w_all = Window.partitionBy()  # N_SHARDS rows — post-reduction, tiny
    return (
        manifest.withColumn(
            "token_share",
            F.round(F.col("n_tokens") / F.sum("n_tokens").over(w_all), 6),
        )
        .select(
            "shard_id",
            "n_docs",
            "n_tokens",
            "n_sources",
            "avg_ttr",
            "token_share",
            "first_doc_id",
        )
    )


_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

CAPSTONE_ORACLE = f"""
WITH base AS (
    SELECT doc_id, source,
           CASE WHEN {_NORM} = ''
                THEN CAST([] AS VARCHAR[])
                ELSE string_split_regex({_NORM}, '\\s+')
           END AS toks,
           md5({_NORM}) AS fingerprint
    FROM documents
    WHERE lang = 'en'
), q AS (
    SELECT doc_id, source, fingerprint,
           len(toks) AS n_tokens,
           round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS ttr,
           md5(array_to_string(list_slice(toks, 1, 30), ' ')) AS head_fp
    FROM base
    WHERE len(toks) BETWEEN 20 AND 90
          AND round(len(list_distinct(toks)) * 1.0 / len(toks), 6) >= 0.35
), curated AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY fingerprint
                                     ORDER BY doc_id) AS rn
        FROM q
    ) WHERE rn = 1 AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'd3'
), head_deduped AS (
    SELECT * FROM (
        SELECT doc_id, source, n_tokens, ttr,
               row_number() OVER (PARTITION BY head_fp ORDER BY doc_id) AS rn
        FROM curated
    ) WHERE rn = 1
), mixed AS (
    SELECT * FROM (
        SELECT doc_id, source, n_tokens, ttr,
               sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '|capstone-mix'),
                            doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM head_deduped
    ) WHERE cum_tokens <= {TOKEN_BUDGET}
), sharded AS (
    SELECT doc_id, source, n_tokens, ttr,
           md5(CAST(doc_id AS VARCHAR) || '|epoch0') AS draw2,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|epoch0'),
                                   1, 15))::UBIGINT % {N_SHARDS} AS INT)
               AS shard_id
    FROM mixed
), positioned AS (
    SELECT *, row_number() OVER (PARTITION BY shard_id
                                 ORDER BY draw2, doc_id) AS pos_in_shard
    FROM sharded
), manifest AS (
    SELECT shard_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           count(DISTINCT source) AS n_sources,
           CAST((2 * sum(CAST(round(ttr * 1e6) AS BIGINT)) + count(*))
                // (2 * count(*)) AS DOUBLE) / 1e6 AS avg_ttr,
           max(CASE WHEN pos_in_shard = 1 THEN doc_id END) AS first_doc_id
    FROM positioned
    GROUP BY shard_id
)
SELECT shard_id, n_docs, n_tokens, n_sources, avg_ttr,
       round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS token_share,
       first_doc_id
FROM manifest
"""

REGISTRY = [
    ("corpus_to_shards_capstone", corpus_to_shards_capstone, CAPSTONE_ORACLE),
]
