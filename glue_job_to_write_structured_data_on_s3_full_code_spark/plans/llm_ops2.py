"""LLM training-data pipeline pack 2 — corpus-preparation operators beyond
dedup/similarity (llm_ops.py): chunking, PII redaction, markup stripping,
deterministic train/eval splitting, and weighted source mixing.

All pure JVM expressions (regexp/substring/sequence/md5) — no Python
boundary, so the hot path stays inside whole-stage codegen. Determinism is
the design rule: splits and sampling hash stable keys (md5 of doc_id) so a
100 TB re-run, a backfill, and the DuckDB oracle all agree row-for-row —
never rand().

The synthetic `documents` fixture has no real PII/HTML, so the redaction and
strip queries first synthesize the noise deterministically from table
columns, then remove it — both engines build and clean the same strings,
which is exactly what the oracle verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources import read_table

CHUNK_STRIDE = 200
CHUNK_LEN = 250  # 50-char overlap between consecutive chunks

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9 -]{8,}[0-9]"


def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width char chunks (stride 200, width 250) via
    sequence+explode — the generator runs per-row inside codegen, output
    is ~n_chars/stride rows per doc with no shuffle. At 100 TB chunking is
    a map-only stage; chunk_id in the key keeps downstream dedup stable."""
    tune(spark)
    # n_chars=0 guard: sequence(0, -1) yields a DESCENDING [0,-1] in Spark
    # but an empty series in DuckDB — filter empties and clamp the bound so
    # both engines emit no rows for empty documents.
    docs = read_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    n_chunks_minus1 = F.greatest(
        F.floor((F.col("n_chars") - 1) / F.lit(float(CHUNK_STRIDE))), F.lit(0)
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), n_chunks_minus1)
            ).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.expr(
                f"substring(text, cast(chunk_id*{CHUNK_STRIDE}+1 as int), {CHUNK_LEN})"
            ).alias("chunk_text"),
        )
        .withColumn("chunk_len", F.length("chunk_text"))
    )


CHUNKING_ORACLE = f"""
SELECT doc_id, chunk_id,
       substring(text, CAST(chunk_id*{CHUNK_STRIDE}+1 AS INT), {CHUNK_LEN}) AS chunk_text,
       length(substring(text, CAST(chunk_id*{CHUNK_STRIDE}+1 AS INT), {CHUNK_LEN})) AS chunk_len
FROM (SELECT doc_id, text,
             unnest(generate_series(0, greatest(CAST(floor((n_chars-1)/{CHUNK_STRIDE}.0) AS BIGINT), 0))) AS chunk_id
      FROM documents WHERE n_chars > 0) t
"""


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction by anchored regexp_replace — the scrub pass
    every served training corpus needs. Synthesizes the PII from doc_id
    (fixture has none), then removes it; map-only at any scale."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    noisy = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +91 98"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 6, "0"),
        F.lit("11 end"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(noisy, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted_text"),
        (F.length(noisy) - F.length(redacted)).alias("chars_removed"),
    )


PII_REDACTION_ORACLE = rf"""
WITH noisy AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or +91 98'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 6, '0') || '11 end' AS n
  FROM documents
), red AS (
  SELECT doc_id, n,
         regexp_replace(regexp_replace(n, '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{PHONE_RE}', '<PHONE>', 'g') AS r
  FROM noisy
)
SELECT doc_id, r AS redacted_text, length(n) - length(r) AS chars_removed
FROM red
"""


def html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup/boilerplate stripping: tag removal + whitespace collapse —
    the first stage of any web-crawl→training-text pipeline. Wraps the
    fixture text in deterministic markup, then strips it back out."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body class="doc"><p>'),
        F.regexp_replace(F.col("text"), " spark ", " <b>spark</b> "),
        F.lit("</p><br/></body></html>"),
    )
    stripped = F.trim(
        F.regexp_replace(F.regexp_replace(html, "<[^>]+>", " "), r"\s+", " ")
    )
    return docs.select(
        "doc_id",
        stripped.alias("clean_text"),
        F.length(stripped).alias("clean_len"),
    )


HTML_STRIP_ORACLE = r"""
WITH h AS (
  SELECT doc_id,
         '<html><body class="doc"><p>'
           || regexp_replace(text, ' spark ', ' <b>spark</b> ', 'g')
           || '</p><br/></body></html>' AS html
  FROM documents
), s AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(html, '<[^>]+>', ' ', 'g'),
                             '\s+', ' ', 'g')) AS clean
  FROM h
)
SELECT doc_id, clean AS clean_text, length(clean) AS clean_len FROM s
"""


def hash_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/eval split: bucket = first 2 hex chars of
    md5(doc_id), split at 'd3' (~82.4% train). Reproducible across runs,
    engines, and cluster sizes — the property rand()-based splits lose the
    moment a partition is retried."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    bucket = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    return docs.select(
        "doc_id",
        "source",
        bucket.alias("bucket_hex"),
        F.when(bucket < "d3", "train").otherwise("eval").alias("split"),
    )


HASH_SPLIT_ORACLE = """
SELECT doc_id, source,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket_hex,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'd3'
            THEN 'train' ELSE 'eval' END AS split
FROM documents
"""


def weighted_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: per-source keep-rate applied by comparing
    a 16-bit md5 prefix of (doc_id, source) against the source's threshold
    — even-numbered sources keep ~25% ('4000'/0x10000), odd keep ~75%
    ('c000'). Deterministic subsampling that composes with the hash split
    above; at 100 TB the filter is pushed into the scan, no shuffle."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    h16 = F.expr(
        "substring(md5(concat(cast(doc_id as string), '|', source)), 1, 4)"
    )
    thresh = F.when(
        F.expr("cast(substring(source, 4) as int)") % 2 == 0, "4000"
    ).otherwise("c000")
    return (
        docs.withColumn("h16", h16)
        .withColumn("keep_below", thresh)
        .where(F.col("h16") < F.col("keep_below"))
        .select("doc_id", "source", "h16", "keep_below")
    )


WEIGHTED_MIX_ORACLE = """
WITH t AS (
  SELECT doc_id, source,
         substring(md5(CAST(doc_id AS VARCHAR) || '|' || source), 1, 4) AS h16,
         CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0
              THEN '4000' ELSE 'c000' END AS keep_below
  FROM documents
)
SELECT doc_id, source, h16, keep_below FROM t WHERE h16 < keep_below
"""


def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composition — the realistic shape of a training-
    data job: quality gate (token count + type-token ratio) → language
    filter → exact dedup on the normalized-text fingerprint (first doc_id
    wins) → deterministic train split. Everything before the dedup window
    is map-only and pushes the lang filter into the scan; the one shuffle
    is on the fingerprint, whose cardinality ≈ distinct docs."""
    from ..functions.text import doc_fingerprint, tokens, normalized_text
    from pyspark.sql import Window

    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(normalized_text("text"))
    n_toks = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_toks
    quality = (
        docs.where(F.col("lang") == "en")
        .withColumn("n_tokens", n_toks)
        .withColumn("ttr", F.round(ttr, 6))
        .where((F.col("n_tokens").between(20, 90)) & (F.col("ttr") >= 0.35))
        .withColumn("fingerprint", doc_fingerprint("text"))
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = (
        quality.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return deduped.where(
        F.expr("substring(md5(cast(doc_id as string)), 1, 2)") < "d3"
    ).select("doc_id", "source", "n_tokens", "ttr", "fingerprint")


CURATION_ORACLE = """
WITH base AS (
  SELECT doc_id, source, lang, text,
         CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')
         END AS toks,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
  FROM documents
), q AS (
  SELECT doc_id, source, len(toks) AS n_tokens,
         round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS ttr,
         fingerprint
  FROM base
  WHERE lang = 'en' AND len(toks) BETWEEN 20 AND 90
        AND round(len(list_distinct(toks)) * 1.0 / len(toks), 6) >= 0.35
), d AS (
  SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM q
)
SELECT doc_id, source, n_tokens, ttr, fingerprint
FROM d
WHERE rn = 1 AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'd3'
"""


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup GROUPS: Jaccard≥0.5 pairs (source-blocked)
    become undirected edges; iterative min-label propagation
    (operators/components.py) assigns every doc the min doc_id of its
    component — the canonical representative to keep. The oracle replays
    the transitive closure with a recursive CTE. Docs in no pair are
    their own singleton component."""
    from ..operators.components import connected_components
    from ..operators.dedup import jaccard_similar_pairs

    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    pairs = jaccard_similar_pairs(
        docs, "text", "doc_id", block_col="source", threshold=0.5
    )
    return connected_components(
        docs.select(F.col("doc_id").alias("node")),
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    ).select(F.col("node").alias("doc_id"), "component")


# The pair SQL mirrors DEDUP_JACCARD_ORACLE (llm_ops.py); the closure is a
# recursive CTE: reach(node,label) holds every label reachable from node,
# so min(label) per node is the component minimum.
DEDUP_COMPONENTS_ORACLE = """
WITH RECURSIVE tok AS (
    SELECT DISTINCT doc_id, source,
           unnest(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')) AS tok
    FROM documents
    WHERE trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) <> ''
), sizes AS (
    SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), co AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM tok a JOIN tok b ON a.tok = b.tok AND a.source = b.source
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT doc_a, doc_b
    FROM co
    JOIN sizes sa ON co.doc_a = sa.doc_id
    JOIN sizes sb ON co.doc_b = sb.doc_id
    WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
), edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
), reach AS (
    SELECT doc_id AS node, doc_id AS label FROM documents
    UNION
    SELECT e.s AS node, r.label
    FROM edges e JOIN reach r ON e.d = r.node
)
SELECT node AS doc_id, min(label) AS component
FROM reach GROUP BY node
"""


def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit: near-duplicate pairs (MinHash-LSH
    candidates, exact-Jaccard verified) that CROSS the deterministic hash
    split — an eval document with a near-dup in train inflates eval
    scores without any literal overlap, which is why decontamination
    suites pair n-gram checks with fuzzy ones. Composes the two existing
    primitives end-to-end: the md5 bucket split (hash_split_train_eval)
    and the md5 Carter-Wegman MinHash family, so the whole audit —
    candidates included — replays in the DuckDB oracle.

    Scale: the pair generation is the sub-quadratic LSH band join; the
    split is a map-side hash of each endpoint. Nothing here is new
    shuffle beyond minhash_lsh_candidates itself."""
    from ..operators.dedup import minhash_lsh_candidates

    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, "text", "doc_id")
    bucket = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    split = docs.select(
        "doc_id",
        F.when(bucket < "d3", "train").otherwise("eval").alias("split"),
    )
    sa = split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select(
            F.when(F.col("split_a") == "eval", F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("eval_doc_id"),
            F.when(F.col("split_a") == "eval", F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("train_doc_id"),
            "jaccard",
        )
    )


def _leakage_oracle() -> str:
    from .llm_ops import _minhash_oracle

    return f"""
WITH pairs AS (
    SELECT * FROM ({_minhash_oracle()})
), split AS (
    SELECT doc_id,
           CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'd3'
                THEN 'train' ELSE 'eval' END AS split
    FROM documents
)
SELECT CASE WHEN sa.split = 'eval' THEN p.doc_a ELSE p.doc_b END AS eval_doc_id,
       CASE WHEN sa.split = 'eval' THEN p.doc_b ELSE p.doc_a END AS train_doc_id,
       p.jaccard
FROM pairs p
JOIN split sa ON p.doc_a = sa.doc_id
JOIN split sb ON p.doc_b = sb.doc_id
WHERE sa.split <> sb.split
"""


SPLIT_LEAKAGE_ORACLE = _leakage_oracle()


def pretraining_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data job, end to end in ONE registered plan —
    the LLM-ops analog of deep_prospect_pipeline: heuristic quality gate
    (token count + type-token ratio) → language filter → exact dedup
    (normalized-text fingerprint, first id wins) → deterministic train
    split → FUZZY dedup (MinHash-LSH candidates, exact-Jaccard verified;
    a doc with a near-dup of smaller id is dropped) → fixed-budget
    sequence packing. Every stage is an already-oracled primitive; this
    query proves they compose, and the oracle replays the entire chain —
    including the LSH banding — on the curated subset.

    Scale: stages 1-4 are the corpus_curation_pipeline shapes (map-only +
    one fingerprint shuffle), the fuzzy stage is the sub-quadratic band
    join on the (already reduced) curated set, packing is one per-source
    window. No stage widens the data back out."""
    from ..functions.text import doc_fingerprint, normalized_text, tokens
    from ..operators.dedup import minhash_lsh_candidates
    from pyspark.sql import Window

    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(normalized_text("text"))
    n_toks = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_toks
    quality = (
        docs.where(F.col("lang") == "en")
        .withColumn("n_tokens", n_toks)
        .withColumn("ttr", F.round(ttr, 6))
        .where((F.col("n_tokens").between(20, 90)) & (F.col("ttr") >= 0.35))
        .withColumn("fingerprint", doc_fingerprint("text"))
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    curated = (
        quality.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .where(F.expr("substring(md5(cast(doc_id as string)), 1, 2)") < "d3")
        .select("doc_id", "source", "text", "n_tokens", "ttr")
    )
    # Materialize the curated set ONCE (r15, guide §2.4): it feeds BOTH the
    # MinHash candidate pipeline and the anti-join's probe side — without a
    # lineage break the whole curation prefix (tokenize → quality gate →
    # fingerprint window) executes once per consumer, i.e. two full corpus
    # passes and two fingerprint shuffles instead of one.
    from ..session import eager_checkpoint

    curated = eager_checkpoint(curated, "pretraining_curated")
    pairs = minhash_lsh_candidates(curated, "text", "doc_id")
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    # the loser set is proportional to the near-dup count, orders of
    # magnitude below the corpus — broadcast the anti join so the curated
    # side is never shuffled (falls back to shuffle only if it outgrows
    # the broadcast threshold)
    fuzzy = curated.join(F.broadcast(losers), "doc_id", "left_anti")
    wp = Window.partitionBy("source").orderBy("doc_id")
    return (
        fuzzy.withColumn(
            "cum_before",
            F.coalesce(
                F.sum("n_tokens").over(wp.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("pack_id", F.floor(F.col("cum_before") / F.lit(512)).cast("bigint"))
        .select("doc_id", "source", "n_tokens", "ttr", "pack_id")
    )


def _pretraining_oracle() -> str:
    from .llm_ops import _minhash_oracle

    return f"""
WITH cbase AS (
  SELECT doc_id, source, lang, text,
         CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
              THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+')
         END AS toks,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
  FROM documents
), cq AS (
  SELECT doc_id, source, text, len(toks) AS n_tokens,
         round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS ttr,
         fingerprint
  FROM cbase
  WHERE lang = 'en' AND len(toks) BETWEEN 20 AND 90
        AND round(len(list_distinct(toks)) * 1.0 / len(toks), 6) >= 0.35
), curated AS (
  SELECT doc_id, source, text, n_tokens, ttr
  FROM (SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
        FROM cq)
  WHERE rn = 1 AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'd3'
), mh_pairs AS (
  SELECT * FROM ({_minhash_oracle(relation="curated")})
), fuzzy AS (
  SELECT c.* FROM curated c
  LEFT JOIN (SELECT DISTINCT doc_b FROM mh_pairs) l ON c.doc_id = l.doc_b
  WHERE l.doc_b IS NULL
)
SELECT doc_id, source, n_tokens, ttr,
       CAST(floor(cum_before / 512) AS BIGINT) AS pack_id
FROM (
    SELECT doc_id, source, n_tokens, ttr,
           coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM fuzzy
) p
"""


PRETRAINING_ORACLE = _pretraining_oracle()


REGISTRY: list[tuple] = [
    ("document_chunking", document_chunking, CHUNKING_ORACLE),
    ("pii_redaction", pii_redaction, PII_REDACTION_ORACLE),
    ("html_strip", html_strip, HTML_STRIP_ORACLE),
    ("hash_split_train_eval", hash_split_train_eval, HASH_SPLIT_ORACLE),
    ("split_leakage_check", split_leakage_check, SPLIT_LEAKAGE_ORACLE),
    ("weighted_source_mix", weighted_source_mix, WEIGHTED_MIX_ORACLE),
    ("corpus_curation_pipeline", corpus_curation_pipeline, CURATION_ORACLE),
    ("pretraining_data_pipeline", pretraining_data_pipeline, PRETRAINING_ORACLE),
    ("dedup_components", dedup_components, DEDUP_COMPONENTS_ORACLE),
]
