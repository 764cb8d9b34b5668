"""LLM training-data pipeline pack 7 — within-document repetition and
entropy quality filters (the Gopher/MassiveText-style rules a curation
stack runs BEFORE any cross-document dedup): duplicate n-gram fractions,
top-bigram share, and token-distribution entropy, each with a keep
verdict.

Scale design: both queries are MAP-ONLY — every metric is a higher-order
array expression over the per-document token array (``transform`` /
``filter`` / ``aggregate``), so there is ZERO shuffle at any corpus size;
the filters run at scan speed and compose with the curation chain ahead
of its first exchange. The top-bigram-share / per-token-count terms are
O(distinct × n) per document — bounded by document length, which a crawl
pipeline bounds upstream; for pathological mega-documents the same metric
falls back to the explode + groupBy(doc_id, gram) shape (two shuffles
keyed by doc, the `duplicated_ngram_spans` pattern).

Cross-engine determinism: fractions compare AFTER ``round(x, 6)``; the
entropy sum folds over the SORTED distinct-token list in both engines, so
the float summation order is identical (the cosine round-before-compare
discipline from operators/similarity.py applied to quality scores).

Reference parity: the reference (FULL.py, a CRM ETL job) has no text
pipeline; north-star extension material on the synthetic ``documents``
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalized_text, tokens
from ..session import tune
from ..sources import read_table

# Dup-fraction thresholds calibrated on the sf0.01 fixture so the verdict
# splits the corpus non-trivially (keeps ~2/3): dup-bigram p75 ≈ 0.047,
# dup-trigram p95 ≈ 0.011, entropy p10 ≈ 3.82. The top-bigram cap is the
# Gopher/MassiveText CHARACTER-fraction form (Rae et al. 2021, Table A1:
# "fraction of characters in most common 2-gram" > 0.20): an occurrence
# share (top_cnt/n_bigrams) is provably DEAD next to the dup-bigram gate
# (share > 0.2 with dup_frac <= 0.05 forces n_bi <= 6, where any repeat
# already means dup_frac >= 1/6), while the char form catches a LONG
# bigram repeated a few times in an otherwise-diverse doc — the
# keyword-stuffing signal the clause exists for. It only applies when
# the top bigram actually REPEATS — a single-occurrence maximum is a
# length artifact, not repetition.
DUP_BIGRAM_MAX = 0.05
DUP_TRIGRAM_MAX = 0.02
TOP_BIGRAM_CHAR_FRAC_MAX = 0.20
ENTROPY_MIN = 3.8
_MIN_TOKENS = 3  # metrics undefined below one trigram


def gopher_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repetition gate: duplicate-bigram fraction, duplicate-
    trigram fraction, and the share of the single most frequent bigram —
    the MassiveText/Gopher-style signals that catch boilerplate loops and
    keyword-stuffed spam that per-token stats (type-token ratio) miss.
    Docs under ``_MIN_TOKENS`` normalized tokens get NULL metrics and
    ``keep = false``."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(normalized_text("text"))
    n = F.size(toks)
    # n-grams as zip_with over shifted slices; lengths clamped at 0 so the
    # short-doc rows (gated out below) never feed slice a negative length
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    n_bi = F.size(bi)
    tri = F.zip_with(
        F.slice(bi, 1, F.greatest(n - 2, F.lit(0))),
        F.slice(toks, 3, F.greatest(n - 2, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    n_tri = F.size(tri)
    long_enough = n >= _MIN_TOKENS
    dup_bi = F.when(
        long_enough, F.round((n_bi - F.size(F.array_distinct(bi))) / n_bi, 6)
    )
    dup_tri = F.when(
        long_enough, F.round((n_tri - F.size(F.array_distinct(tri))) / n_tri, 6)
    )
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(bi),
            lambda d: F.size(F.filter(bi, lambda x: x == d)),
        )
    )
    top_share = F.when(long_enough, F.round(top_cnt / n_bi, 6))
    # chars covered by occurrences of the best REPEATED bigram over the
    # doc's normalized chars — max of cnt·len over repeated bigrams, so
    # no tie-break is needed on equal counts; NULL (no repeats) passes
    norm_len = F.length(normalized_text("text"))
    top_chars = F.array_max(
        F.transform(
            F.filter(
                F.array_distinct(bi),
                lambda d: F.size(F.filter(bi, lambda x: x == d)) >= 2,
            ),
            lambda d: F.size(F.filter(bi, lambda x: x == d)) * F.length(d),
        )
    )
    top_char_frac = F.when(
        long_enough & top_chars.isNotNull(),
        F.round(top_chars / norm_len, 6),
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        dup_bi.alias("dup_bigram_frac"),
        dup_tri.alias("dup_trigram_frac"),
        top_share.alias("top_bigram_share"),
        top_char_frac.alias("top_bigram_char_frac"),
        (
            long_enough
            & (dup_bi <= DUP_BIGRAM_MAX)
            & (dup_tri <= DUP_TRIGRAM_MAX)
            & (
                top_char_frac.isNull()
                | (top_char_frac <= TOP_BIGRAM_CHAR_FRAC_MAX)
            )
        ).alias("keep"),
    )


_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS = (
    f"CASE WHEN {_NORM} = '' THEN CAST([] AS VARCHAR[]) "
    f"ELSE string_split_regex({_NORM}, '\\s+') END"
)

GOPHER_REPETITION_ORACLE = f"""
WITH base AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
), g AS (
    SELECT doc_id, toks, len(toks) AS n,
           list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1]) AS bi,
           list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               AS tri
    FROM base
), m AS (
    SELECT doc_id, n,
           CASE WHEN n >= {_MIN_TOKENS} THEN
               round((len(bi) - len(list_distinct(bi))) * 1.0 / len(bi), 6)
           END AS dup_bigram_frac,
           CASE WHEN n >= {_MIN_TOKENS} THEN
               round((len(tri) - len(list_distinct(tri))) * 1.0 / len(tri), 6)
           END AS dup_trigram_frac,
           CASE WHEN n >= {_MIN_TOKENS} THEN
               round(list_max(list_transform(list_distinct(bi),
                         d -> len(list_filter(bi, x -> x = d))))
                     * 1.0 / len(bi), 6)
           END AS top_bigram_share,
           -- chars covered by the best REPEATED bigram / normalized
           -- chars; NULL (no repeats) passes — mirrors the Spark side
           CASE WHEN n >= {_MIN_TOKENS} THEN
               round(list_max(list_transform(
                         list_filter(list_distinct(bi),
                             d -> len(list_filter(bi, x -> x = d)) >= 2),
                         d -> len(list_filter(bi, x -> x = d)) * length(d)))
                     * 1.0 / length({_NORM}), 6)
           END AS top_bigram_char_frac
    FROM g JOIN documents USING (doc_id)
)
SELECT doc_id, CAST(n AS INT) AS n_tokens,
       dup_bigram_frac, dup_trigram_frac, top_bigram_share,
       top_bigram_char_frac,
       coalesce(n >= {_MIN_TOKENS}
                AND dup_bigram_frac <= {DUP_BIGRAM_MAX}
                AND dup_trigram_frac <= {DUP_TRIGRAM_MAX}
                AND (top_bigram_char_frac IS NULL
                     OR top_bigram_char_frac <= {TOP_BIGRAM_CHAR_FRAC_MAX}),
            false) AS keep
FROM m
"""


def token_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document (low entropy =
    repetitive or template text), with a minimum-entropy keep gate.
    The sum folds over the SORTED distinct-token list so Spark and the
    oracle add terms in the same order — bit-stable before the 6-dp
    round. Docs under ``_MIN_TOKENS`` tokens: NULL entropy, keep=false."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(normalized_text("text"))
    n = F.size(toks)
    p = lambda d: F.size(F.filter(toks, lambda x: x == d)) / n  # noqa: E731
    ent = F.round(
        -F.aggregate(
            F.array_sort(F.array_distinct(toks)),
            F.lit(0.0),
            lambda acc, d: acc + p(d) * F.log2(p(d)),
        ),
        6,
    )
    long_enough = n >= _MIN_TOKENS
    ent_gated = F.when(long_enough, ent)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        ent_gated.alias("token_entropy"),
        (long_enough & (ent_gated >= ENTROPY_MIN)).alias("keep"),
    )


TOKEN_ENTROPY_ORACLE = f"""
WITH base AS (
    SELECT doc_id, {_TOKS} AS toks FROM documents
), m AS (
    SELECT doc_id, len(toks) AS n,
           CASE WHEN len(toks) >= {_MIN_TOKENS} THEN
               round(-list_sum(list_transform(
                   list_sort(list_distinct(toks)),
                   d -> (len(list_filter(toks, x -> x = d)) * 1.0 / len(toks))
                        * log2(len(list_filter(toks, x -> x = d)) * 1.0
                               / len(toks)))), 6)
           END AS token_entropy
    FROM base
)
SELECT doc_id, CAST(n AS INT) AS n_tokens, token_entropy,
       coalesce(n >= {_MIN_TOKENS} AND token_entropy >= {ENTROPY_MIN}, false)
           AS keep
FROM m
"""

REGISTRY = [
    ("gopher_repetition_filter", gopher_repetition_filter, GOPHER_REPETITION_ORACLE),
    ("token_entropy_filter", token_entropy_filter, TOKEN_ENTROPY_ORACLE),
]
