"""LLM training-data pipeline pack 4 — batch-composition operators that sit
between a curated corpus and the trainer: sequence packing, stratified
sampling, sub-document dedup, and stopword discovery.

Design rules carried over from llm_ops2.py: pure JVM expressions, no Python
boundary; all ordering and sampling decisions derive from stable keys
(doc_id, md5) so a re-run at any scale reproduces the same rows — never
rand(). Each query's shuffle budget is stated in its docstring; none needs
more than one exchange on the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..session import tune
from ..sources import read_table

PACK_BUDGET = 512  # tokens per training sequence pack
SAMPLE_PER_STRATUM = 20

# DuckDB spelling of token_count(): whitespace split of trimmed text, with
# the empty-string → 0 case made explicit (len(string_split('', ..)) is 1).
_TOKCNT = (
    "CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0 "
    "ELSE len(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END"
)


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed token-budget training sequences.

    Streaming first-fit within each source: docs are taken in stable
    doc_id order, a running token total assigns each doc to pack
    ``floor(cum_before / budget)`` — the standard contiguous-packing
    approximation (exact bin packing is NP-hard and order-unstable).
    One shuffle: the per-source window sort. At 100 TB the partition key
    would extend to (source, shard) so no single window partition exceeds
    an executor; the fixture's 4 sources stand in for those shards.
    Over-budget docs (n_tok >= budget) become singleton packs by the same
    arithmetic — cum_before strictly increases past a full budget.
    """
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    toks = docs.select("source", "doc_id", token_count("text").alias("n_tok"))
    packed = toks.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn(
        "pack_id", F.floor(F.col("cum_before") / F.lit(PACK_BUDGET)).cast("bigint")
    )
    return packed.select("source", "doc_id", "n_tok", "pack_id")


SEQUENCE_PACKING_ORACLE = f"""
SELECT source, doc_id, n_tok,
       CAST(floor(cum_before / {PACK_BUDGET}) AS BIGINT) AS pack_id
FROM (
    SELECT source, doc_id, n_tok,
           coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM (SELECT source, doc_id, CAST({_TOKCNT} AS INT) AS n_tok FROM documents) t
) p
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-stratum sample: within each (source, lang)
    stratum keep the ``SAMPLE_PER_STRATUM`` docs with the lowest
    md5(doc_id) — a uniform, rerun-stable draw (the hash is the random
    number). One shuffle (the stratum window); at scale this is the
    standard way to cap any stratum's contribution to a training mix
    without a global sort or driver-side reservoir state.
    """
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy("draw", "doc_id")
    return (
        docs.select(
            "source", "lang", "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("draw"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= SAMPLE_PER_STRATUM)
        .select("source", "lang", "doc_id", F.col("rk").cast("int").alias("rk"))
    )


STRATIFIED_SAMPLE_ORACLE = f"""
SELECT source, lang, doc_id, CAST(rk AS INT) AS rk
FROM (
    SELECT source, lang, doc_id,
           row_number() OVER (PARTITION BY source, lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM documents
) t
WHERE rk <= {SAMPLE_PER_STRATUM}
"""


def sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup: exact dedup at sentence granularity (the
    fine-grained pass corpus pipelines run after document-level dedup —
    boilerplate sentences repeat across distinct documents). Sentences
    split on '. ', hashed, grouped; survivors = lowest (doc_id, pos).
    Output keeps only sentences long enough to be meaningful (>= 40
    chars) that occur in more than one place. Explode is map-side; the
    digest groupBy is the single shuffle, on a 128-bit hash never the
    payload."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    sent = docs.select(
        "doc_id", F.posexplode(F.split("text", r"\. ")).alias("pos", "sentence")
    ).where(F.length("sentence") >= 40)
    return (
        sent.groupBy(F.md5(F.col("sentence")).alias("digest"))
        .agg(
            F.count("*").alias("n_occurrences"),
            F.min(F.struct("doc_id", "pos")).alias("keeper"),
        )
        .where(F.col("n_occurrences") > 1)
        .select(
            "digest",
            "n_occurrences",
            F.col("keeper.doc_id").alias("keep_doc"),
            F.col("keeper.pos").cast("int").alias("keep_pos"),
        )
    )


SENTENCE_DEDUP_ORACLE = """
WITH sent AS (
    SELECT doc_id,
           CAST(generate_subscripts(parts, 1) - 1 AS INT) AS pos,
           unnest(parts) AS sentence
    FROM (SELECT doc_id, string_split(text, '. ') AS parts FROM documents) t
), ranked AS (
    SELECT sentence, doc_id, pos,
           row_number() OVER (PARTITION BY sentence ORDER BY doc_id, pos) AS rn,
           count(*)     OVER (PARTITION BY sentence) AS n_occ
    FROM sent WHERE length(sentence) >= 40
)
SELECT md5(sentence) AS digest,
       n_occ AS n_occurrences,
       doc_id AS keep_doc,
       CAST(pos AS INT) AS keep_pos
FROM ranked
WHERE rn = 1 AND n_occ > 1
"""


def stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-driven stopword list: tokens whose document frequency
    exceeds 30% of all documents. The df cap every posting-list operator
    (jaccard, minhash verification) wants as an input — computing it is
    one explode + one groupBy on the token (array_distinct keeps the
    explode per-document-unique, so df is exact with no distinct
    shuffle)."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # one cheap metadata-only job; value folds into the plan
    tok = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")),
                    r"\s+",
                )
            )
        ).alias("tok"),
    ).where(F.col("tok") != "")
    return (
        tok.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > 0.3 * n_docs)
        .select("tok", "df", F.round(F.col("df") / F.lit(n_docs), 6).alias("df_share"))
    )


STOPWORD_ORACLE = """
WITH tok AS (
    SELECT DISTINCT doc_id, unnest(
        string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')
    ) AS tok
    FROM documents
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tok, count(*) AS df,
       round(count(*) / (SELECT n_docs FROM n), 6) AS df_share
FROM tok
WHERE tok <> ''
GROUP BY tok
HAVING count(*) > 0.3 * (SELECT n_docs FROM n)
"""


def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights for a training mix:
    w_s ∝ (tokens_s)^τ with τ = 0.7 — the standard recipe (mBERT/XLM-R
    multilingual sampling; the Pile's per-set epochs) for up-weighting
    small sources without drowning large ones. Outputs per source its
    token mass, raw share, temperature share, and the effective epoch
    count (temperature share ÷ raw share) a sampler would apply.

    Scale: one map-side token count + one tiny (n_sources-row) aggregate;
    the normalizing sum is a window over that tiny frame — nothing here
    grows with corpus size except the first aggregation, which is the
    same shuffle the corpus-stats queries already pay."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).alias("n_tokens")
    )
    wall = Window.partitionBy()
    powed = F.pow(F.col("n_tokens").cast("double"), F.lit(0.7))
    return (
        per_source.withColumn("total_tokens", F.sum("n_tokens").over(wall))
        .withColumn("raw_share", F.col("n_tokens") / F.col("total_tokens"))
        .withColumn("t_share", powed / F.sum(powed).over(wall))
        .select(
            "source",
            "n_tokens",
            F.round("raw_share", 6).alias("raw_share"),
            F.round("t_share", 6).alias("temperature_share"),
            F.round(F.col("t_share") / F.col("raw_share"), 4).alias(
                "effective_epochs"
            ),
        )
    )


TEMPERATURE_MIX_ORACLE = """
WITH per_source AS (
    SELECT source,
           CAST(sum(CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g') = '' THEN 0
                         ELSE len(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END)
                AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
)
SELECT source, n_tokens,
       round(n_tokens / sum(n_tokens) OVER (), 6) AS raw_share,
       round(pow(n_tokens, 0.7) / sum(pow(n_tokens, 0.7)) OVER (), 6)
           AS temperature_share,
       round((pow(n_tokens, 0.7) / sum(pow(n_tokens, 0.7)) OVER ())
             / (n_tokens / sum(n_tokens) OVER ()), 4) AS effective_epochs
FROM per_source
"""


REGISTRY: list[tuple] = [
    ("sequence_packing", sequence_packing, SEQUENCE_PACKING_ORACLE),
    ("stratified_sample", stratified_sample, STRATIFIED_SAMPLE_ORACLE),
    ("sentence_dedup", sentence_dedup, SENTENCE_DEDUP_ORACLE),
    ("stopword_discovery", stopword_discovery, STOPWORD_ORACLE),
    ("temperature_mix_weights", temperature_mix_weights, TEMPERATURE_MIX_ORACLE),
]
