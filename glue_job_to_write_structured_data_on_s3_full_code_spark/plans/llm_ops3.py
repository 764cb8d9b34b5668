"""LLM training-data pipeline pack 3 — corpus statistics and filtering:
vocabulary building, TF-IDF term scoring, n-gram eval-set decontamination,
repetition-based quality filtering, per-source quality gating, and bigram
language-model statistics.

Design rules (same as llm_ops/llm_ops2):
- pure ``pyspark.sql.functions`` expressions — the hot path stays inside
  whole-stage codegen, no Python boundary;
- every query carries a DuckDB oracle, so outputs avoid array columns and
  anything float-boundary-sensitive (rank-based gates instead of comparing
  against an interpolated percentile, integer counts wherever possible);
- deterministic at any parallelism: ties always break on (token, doc_id),
  sampling/splitting reuses the md5-bucket rule from llm_ops2.

Scale notes (100 TB): every query here is shaped as map-side tokenize →
one or two equality-shuffle aggregations. The n-gram joins shuffle 16-byte
md5 keys, not the n-gram strings themselves, so shuffle volume tracks row
count, not text length. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text, tokens
from ..session import tune
from ..sources import read_table

# DuckDB spellings of normalized_text / tokens.
_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS = f"string_split_regex({_NORM}, '\\s+')"

TRAIN_BUCKET_MAX = "d3"  # md5(doc_id) 2-hex-char bucket < 'd3' → train (llm_ops2)


def _nonempty_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.where(normalized_text("text") != "").select(
        "doc_id", "source", tokens(normalized_text("text")).alias("ts")
    )


def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: term frequency + document frequency per token,
    top 100 by frequency. The tokenizer-training precursor (BPE & friends
    start from exactly this table). One explode, one hash aggregation with
    map-side combine; top-k is TakeOrdered on the driver — never a global
    sort of the vocabulary."""
    tune(spark)
    toks = _nonempty_tokens(spark, sf_dir)
    return (
        toks.select("doc_id", F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "tok")
        .limit(100)
    )


VOCAB_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest({_TOKS}) AS tok
    FROM documents WHERE {_NORM} <> ''
)
SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM tok GROUP BY tok
ORDER BY tf DESC, tok LIMIT 100
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 characteristic terms by TF-IDF — the classic
    keyword/relevance primitive. The document-frequency table and corpus
    size join back as broadcasts (they are vocabulary-sized, tiny next to
    the corpus), so the fact side pays one groupBy(doc, tok) shuffle plus
    the per-doc top-k window."""
    tune(spark)
    toks = _nonempty_tokens(spark, sf_dir)
    tf = (
        toks.select("doc_id", F.explode("ts").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = (
        toks.select("doc_id", F.explode(F.array_distinct("ts")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    n_docs = toks.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", F.col("rk").alias("rank"), "tok", "tf", "df", "tfidf")
    )


TFIDF_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_TOKS} AS ts FROM documents WHERE {_NORM} <> ''
), tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM (SELECT doc_id, unnest(ts) AS tok FROM toks) GROUP BY 1, 2
), df AS (
    SELECT tok, count(*) AS df
    FROM (SELECT DISTINCT doc_id, unnest(ts) AS tok FROM toks) GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM toks),
scored AS (
    SELECT tf.doc_id, tf.tok, tf.tf, df.df,
           round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf,
           row_number() OVER (PARTITION BY tf.doc_id
                              ORDER BY round(tf.tf * ln(n.n_docs / df.df), 6) DESC,
                                       tf.tok) AS rk
    FROM tf JOIN df USING (tok) CROSS JOIN n
)
SELECT doc_id, rk AS rank, tok, tf, df, tfidf FROM scored WHERE rk <= 3
"""


def _five_grams(ts: F.Column) -> F.Column:
    n = F.size(ts)
    return F.when(
        n >= 5,
        F.transform(
            F.sequence(F.lit(0), n - 5),
            lambda i: F.concat_ws(" ", *[ts[i + k] for k in range(5)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", ts)))


def five_gram_digests(with_text: DataFrame, *key_cols: str) -> DataFrame:
    """(key_cols..., text) → distinct (key_cols..., gh) where gh is the
    md5 of each 5-gram over the normalized token stream (docs shorter
    than 5 tokens contribute their whole text as one gram).

    Explodes the gram INDEX rather than a built gram array: constructing
    grams inside a `transform` lambda makes Catalyst inline the (unaliased)
    tokenizer subtree into every array-element evaluation — measured 77 s
    vs 2 s at sf0.1 (SCALE.md tuning log). Index-explode tokenizes once
    per row and builds each gram as a flat codegen projection."""
    toks = with_text.where(normalized_text("text") != "").select(
        *key_cols, tokens(normalized_text("text")).alias("ts")
    )
    n = F.size("ts")
    idx = toks.select(
        *key_cols,
        "ts",
        F.explode(
            F.when(n >= 5, F.sequence(F.lit(0), n - 5)).otherwise(
                F.array(F.lit(-1))
            )
        ).alias("i"),
    )
    gram = F.when(
        F.col("i") >= 0,
        F.concat_ws(
            " ", *[F.element_at("ts", F.col("i") + k + 1) for k in range(5)]
        ),
    ).otherwise(F.concat_ws(" ", "ts"))
    return idx.select(*key_cols, F.md5(gram).alias("gh")).distinct()


#: documents-input size below which ngram_contamination_check takes the
#: two-pass digest-join branch instead of the one-pass window. A pure
#: performance dial — the branches are row-identical (pinned by
#: tests/test_r16_optimizations.py and the shared oracle); see the
#: function docstring for the regime analysis.
_CONTAMINATION_SMALL_INPUT_MAX_BYTES = 1 << 30  # 1 GiB


def ngram_contamination_check(
    spark: SparkSession,
    sf_dir: str,
    small_input_max_bytes: int = _CONTAMINATION_SMALL_INPUT_MAX_BYTES,
) -> DataFrame:
    """Eval-set decontamination: for every eval-split document, the share
    of its distinct 5-grams that also appear anywhere in the train split
    (the GPT-3/PaLM-style n-gram overlap check). Train/eval reuse the
    deterministic md5-bucket split from hash_split_train_eval.

    Every shuffle carries md5(gram) — 32-hex-char keys — so at 100 TB
    fixed-width digests move instead of raw 5-gram text; both engines key
    on the digest, so collisions (if any) affect both identically.

    The train-overlap test is SIZE-GATED (r16, the r15 verdict's
    prescription) between two row-identical plans:

    - **small inputs** (documents under ``small_input_max_bytes``, stat'ed
      job-free from the filesystem): the distinct train-digest set is left-
      joined back to the eval gram rows. This re-generates the grams once
      per branch (two scan→tokenize→explode chains), which is cheap when
      the corpus is small and lets AQE pick a broadcast for the tiny train
      set — consistently the fastest local shape (r16 same-boot A/B medians
      1.60-2.23 s vs the window's 1.77-3.11 s at sf0.1, and the r15 driver
      clocked the window form at 0.34× the join form's r14 time).
    - **at scale**: ``max(bucket < cut) over (partition by gh)`` on the ONE
      distinct gram table — one gram generation, one digest exchange, no
      second corpus pass and no unbounded broadcast build side (the r15
      rationale, kept verbatim for the regime it was designed for). The
      window's per-key sort also degrades more gracefully than any
      per-group buffering alternative when one boilerplate gram is shared
      by a huge share of the corpus (sorts spill; aggregation buffers
      don't).

    Unknown input size (non-local scheme) takes the scale branch."""
    tune(spark)
    from pyspark.sql import Window

    from ..sources import table_input_bytes

    docs = read_table(spark, sf_dir, "documents")
    bucket = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    grams = five_gram_digests(
        docs.select("doc_id", bucket.alias("bucket"), "text"), "doc_id", "bucket"
    )
    if table_input_bytes(sf_dir, "documents") < small_input_max_bytes:
        train_g = (
            grams.where(F.col("bucket") < TRAIN_BUCKET_MAX)
            .select("gh")
            .distinct()
        )
        contaminated = (
            grams.where(F.col("bucket") >= TRAIN_BUCKET_MAX)
            .join(train_g.withColumn("_hit", F.lit(1)), "gh", "left")
            .select("doc_id", F.coalesce("_hit", F.lit(0)).alias("hit"))
        )
    else:
        hit = F.max(
            F.when(F.col("bucket") < TRAIN_BUCKET_MAX, 1).otherwise(0)
        ).over(Window.partitionBy("gh"))
        contaminated = (
            grams.withColumn("hit", hit)
            .where(F.col("bucket") >= TRAIN_BUCKET_MAX)
            .select("doc_id", "hit")
        )
    return (
        contaminated.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum("hit").alias("n_contaminated"),
            F.round(F.sum("hit") / F.count("*"), 6).alias("contamination"),
        )
        .withColumn("flagged", F.col("contamination") >= 0.5)
    )


CONTAMINATION_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
           {_TOKS} AS ts
    FROM documents WHERE {_NORM} <> ''
), grams AS (
    SELECT DISTINCT doc_id, bucket,
           md5(g) AS gh
    FROM (
        SELECT doc_id, bucket,
               unnest(CASE WHEN len(ts) >= 5
                      THEN [array_to_string(ts[i + 1:i + 5], ' ')
                            FOR i IN range(len(ts) - 4)]
                      ELSE [array_to_string(ts, ' ')] END) AS g
        FROM toks
    )
), train_g AS (
    SELECT DISTINCT gh FROM grams WHERE bucket < '{TRAIN_BUCKET_MAX}'
), ev AS (
    SELECT doc_id, gh FROM grams WHERE bucket >= '{TRAIN_BUCKET_MAX}'
)
SELECT ev.doc_id,
       count(*) AS n_ngrams,
       count(t.gh) AS n_contaminated,
       round(count(t.gh) / count(*), 6) AS contamination,
       round(count(t.gh) / count(*), 6) >= 0.5 AS flagged
FROM ev LEFT JOIN train_g t USING (gh)
GROUP BY ev.doc_id
"""


def repetition_ratio_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (Gopher/MassiveText-style): the
    share of a document's bigrams taken by its single most frequent bigram.
    Degenerate machine-generated text scores high. Two aggregations, both
    keyed on doc_id — partial aggregation absorbs the explode fan-out."""
    tune(spark)
    toks = _nonempty_tokens(spark, sf_dir)
    n = F.size(F.col("ts"))
    bigrams = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(" ", F.col("ts")[i], F.col("ts")[i + 1]),
    )
    per_gram = (
        toks.where(n >= 2)
        .select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bigram_count"),
            F.round(F.max("c") / F.sum("c"), 6).alias("repetition_ratio"),
        )
        .withColumn("flagged", F.col("repetition_ratio") > 0.1)
    )


REPETITION_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_TOKS} AS ts FROM documents WHERE {_NORM} <> ''
), grams AS (
    SELECT doc_id, unnest([ts[i + 1] || ' ' || ts[i + 2]
                           FOR i IN range(len(ts) - 1)]) AS g
    FROM toks WHERE len(ts) >= 2
), per_gram AS (
    SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       max(c) AS top_bigram_count,
       round(max(c) / sum(c), 6) AS repetition_ratio,
       round(max(c) / sum(c), 6) > 0.1 AS flagged
FROM per_gram GROUP BY doc_id
"""


def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source relative quality gate: keep each source's top half of
    documents by type-token ratio. Rank-based (row_number vs the partition
    count) rather than value-vs-percentile, so there is no float boundary
    for the two engines to disagree on — the idiom to prefer at scale,
    where a quantile is an estimate anyway."""
    tune(spark)
    toks = _nonempty_tokens(spark, sf_dir)
    ttr = F.round(F.size(F.array_distinct("ts")) / F.size("ts"), 6)
    scored = toks.select("doc_id", "source", ttr.alias("ttr"))
    w_rank = Window.partitionBy("source").orderBy(F.col("ttr").desc(), "doc_id")
    w_all = Window.partitionBy("source")
    return (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .withColumn("n_src", F.count("*").over(w_all))
        .where(F.col("rk") <= F.ceil(F.col("n_src") / 2))
        .select("doc_id", "source", "ttr", F.col("rk").alias("quality_rank"), "n_src")
    )


QUALITY_GATE_ORACLE = f"""
WITH scored AS (
    SELECT doc_id, source,
           round(len(list_distinct({_TOKS})) / len({_TOKS}), 6) AS ttr
    FROM documents WHERE {_NORM} <> ''
), ranked AS (
    SELECT doc_id, source, ttr,
           row_number() OVER (PARTITION BY source ORDER BY ttr DESC, doc_id) AS rk,
           count(*) OVER (PARTITION BY source) AS n_src
    FROM scored
)
SELECT doc_id, source, ttr, rk AS quality_rank, n_src
FROM ranked WHERE rk <= ceil(n_src / 2.0)
"""


def bigram_lm_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics: P(w2 | w1) for the corpus's 50
    most frequent bigrams. The unigram (first-word) totals come from a
    window sum over the already-aggregated bigram table — no second scan
    of the corpus and no extra shuffle beyond the bigram groupBy."""
    tune(spark)
    toks = _nonempty_tokens(spark, sf_dir)
    n = F.size(F.col("ts"))
    pairs = toks.where(n >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.struct(
                    F.col("ts")[i].alias("w1"), F.col("ts")[i + 1].alias("w2")
                ),
            )
        ).alias("p")
    )
    counts = pairs.groupBy("p.w1", "p.w2").agg(F.count("*").alias("pair_count"))
    w1_total = Window.partitionBy("w1")
    return (
        counts.withColumn("w1_count", F.sum("pair_count").over(w1_total))
        .withColumn(
            "cond_prob", F.round(F.col("pair_count") / F.col("w1_count"), 6)
        )
        .orderBy(F.col("pair_count").desc(), "w1", "w2")
        .limit(50)
    )


BIGRAM_LM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_TOKS} AS ts FROM documents WHERE {_NORM} <> ''
), pairs AS (
    SELECT unnest([{{'w1': ts[i + 1], 'w2': ts[i + 2]}}
                   FOR i IN range(len(ts) - 1)]) AS p
    FROM toks WHERE len(ts) >= 2
), counts AS (
    SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS pair_count FROM pairs GROUP BY 1, 2
)
SELECT w1, w2, pair_count,
       CAST(sum(pair_count) OVER (PARTITION BY w1) AS BIGINT) AS w1_count,
       round(pair_count / (sum(pair_count) OVER (PARTITION BY w1)), 6) AS cond_prob
FROM counts
ORDER BY pair_count DESC, w1, w2 LIMIT 50
"""


def bigram_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: score every document by the average
    log-probability of its bigrams under an add-one-smoothed bigram model
    trained on the corpus itself, and flag each source's worst decile
    (highest perplexity). Wenzek et al., "CCNet: Extracting High Quality
    Monolingual Datasets from Web Crawl Data" (LREC 2020) filters with a
    KenLM perplexity in exactly this shape; the bigram model keeps it
    deterministic and oracle-replayable.

    Scale: training IS the corpus bigram count (one groupBy); scoring is
    a broadcast-model join back onto per-doc counts — no per-doc Python,
    no second corpus scan for the context totals (window over the model).
    The decile gate is RANK-based per source (no float-vs-quantile
    boundary for engines to disagree on, same idiom as
    quality_percentile_gate), and ranking on the ROUNDED score keeps the
    cross-engine tie-break stable."""
    tune(spark)
    toks = _nonempty_tokens(spark, sf_dir)
    n = F.size(F.col("ts"))
    pairs = toks.where(n >= 2).select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.struct(
                    F.col("ts")[i].alias("w1"), F.col("ts")[i + 1].alias("w2")
                ),
            )
        ).alias("p"),
    )
    doc_counts = pairs.groupBy("doc_id", "source", "p.w1", "p.w2").agg(
        F.count("*").alias("cnt")
    )
    model = doc_counts.groupBy("w1", "w2").agg(F.sum("cnt").alias("cw12"))
    model = model.withColumn(
        "cw1", F.sum("cw12").over(Window.partitionBy("w1"))
    )
    vocab = model.agg(F.countDistinct("w2").alias("v"))
    logp = F.log((F.col("cw12") + 1) / (F.col("cw1") + F.col("v")))
    scored = (
        doc_counts.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.round(F.sum(F.col("cnt") * logp) / F.sum("cnt"), 6).alias(
                "avg_logp"
            ),
        )
    )
    w_rank = Window.partitionBy("source").orderBy(F.col("avg_logp").asc(), "doc_id")
    w_all = Window.partitionBy("source")
    return (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .withColumn("n_src", F.count("*").over(w_all))
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            "avg_logp",
            F.round(F.exp(-F.col("avg_logp")), 4).alias("ppl"),
            (F.col("rk") <= F.ceil(F.col("n_src") / 10.0)).alias("flagged"),
        )
    )


BIGRAM_PPL_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, source, {_TOKS} AS ts FROM documents WHERE {_NORM} <> ''
), pairs AS (
    SELECT doc_id, source,
           unnest([{{'w1': ts[i + 1], 'w2': ts[i + 2]}}
                   FOR i IN range(len(ts) - 1)]) AS p
    FROM toks WHERE len(ts) >= 2
), doc_counts AS (
    SELECT doc_id, source, p.w1 AS w1, p.w2 AS w2, count(*) AS cnt
    FROM pairs GROUP BY 1, 2, 3, 4
), model AS (
    SELECT w1, w2, sum(cnt) AS cw12,
           sum(sum(cnt)) OVER (PARTITION BY w1) AS cw1
    FROM doc_counts GROUP BY 1, 2
), scored AS (
    SELECT d.doc_id, d.source,
           CAST(sum(d.cnt) AS BIGINT) AS n_bigrams,
           round(sum(d.cnt * ln((m.cw12 + 1) / (m.cw1 + v.v)))
                 / sum(d.cnt), 6) AS avg_logp
    FROM doc_counts d
    JOIN model m USING (w1, w2)
    CROSS JOIN (SELECT count(DISTINCT w2) AS v FROM model) v
    GROUP BY 1, 2
)
SELECT doc_id, source, n_bigrams, avg_logp,
       round(exp(-avg_logp), 4) AS ppl,
       row_number() OVER (PARTITION BY source ORDER BY avg_logp ASC, doc_id)
           <= ceil(count(*) OVER (PARTITION BY source) / 10.0) AS flagged
FROM scored
"""


_CMS_DEPTH = 4
_CMS_WIDTH = 1024


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters with a fully ORACLED sketch: the
    hash rows are md5-derived (row i buckets token t at
    md5(i ':' t) mod width), so unlike the HLL/percentile suite the whole
    sketch — counters, point queries, the min-over-rows estimate — is
    bit-reproducible in DuckDB. Reports the top-50 true-count tokens with
    their CMS estimate; CMS guarantees est ≥ true (collisions only ever
    inflate), asserted as the ``overestimated`` flag.

    Scale: the sketch is depth×width integers REGARDLESS of corpus size —
    the counter build is one groupBy over (row, bucket) with map-side
    combine, and a 100 TB corpus compresses into the same 4×1024 cells.
    Point lookups join candidates against the (tiny, broadcast) counter
    table. This is the memory story exact vocab counting can't offer."""
    tune(spark)
    toks = _nonempty_tokens(spark, sf_dir)
    tok = toks.select(F.explode("ts").alias("tok"))

    def bucket(i: int, col) -> "F.Column":
        h = F.md5(F.concat(F.lit(f"{i}:"), col))
        return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _CMS_WIDTH

    counters = (
        tok.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row"), bucket(i, F.col("tok")).alias("b")
                        )
                        for i in range(_CMS_DEPTH)
                    ]
                )
            ).alias("rb")
        )
        .groupBy("rb.row", "rb.b")
        .agg(F.count("*").alias("c"))
    )

    true_counts = (
        tok.groupBy("tok")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.col("true_count").desc(), "tok")
        .limit(50)
    )
    probes = true_counts.select(
        "tok",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), bucket(i, F.col("tok")).alias("b"))
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("rb"),
    ).select("tok", "true_count", "rb.row", "rb.b")

    return (
        probes.join(F.broadcast(counters), ["row", "b"])
        .groupBy("tok", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "tok",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") > F.col("true_count")).alias("overestimated"),
        )
    )


def _cms_oracle(depth: int = 4, width: int = 1024) -> str:
    bucket = (
        "CAST(concat('0x', substr(md5(concat(CAST(r.row AS VARCHAR), ':', tok)), 1, 15))"
        f" AS BIGINT) % {width}"
    )
    return f"""
WITH rows_ AS (SELECT unnest(range({depth})) AS row),
tok AS (
    SELECT unnest({_TOKS}) AS tok FROM documents WHERE {_NORM} <> ''
), counters AS (
    SELECT r.row, {bucket} AS b, count(*) AS c
    FROM tok CROSS JOIN rows_ r
    GROUP BY 1, 2
), true_counts AS (
    SELECT tok, count(*) AS true_count
    FROM tok GROUP BY 1
    ORDER BY true_count DESC, tok LIMIT 50
), probes AS (
    SELECT t.tok, t.true_count, r.row, {bucket} AS b
    FROM true_counts t CROSS JOIN rows_ r
)
SELECT p.tok, p.true_count,
       CAST(min(c.c) AS BIGINT) AS cms_estimate,
       CAST(min(c.c) AS BIGINT) > p.true_count AS overestimated
FROM probes p JOIN counters c ON p.row = c.row AND p.b = c.b
GROUP BY 1, 2
"""


CMS_HEAVY_HITTERS_ORACLE = _cms_oracle()


REGISTRY = [
    ("vocab_top_terms", vocab_top_terms, VOCAB_ORACLE),
    ("tfidf_top_terms", tfidf_top_terms, TFIDF_ORACLE),
    ("ngram_contamination_check", ngram_contamination_check, CONTAMINATION_ORACLE),
    ("repetition_ratio_filter", repetition_ratio_filter, REPETITION_ORACLE),
    ("quality_percentile_gate", quality_percentile_gate, QUALITY_GATE_ORACLE),
    ("bigram_lm_probs", bigram_lm_probs, BIGRAM_LM_ORACLE),
    ("bigram_perplexity_filter", bigram_perplexity_filter, BIGRAM_PPL_ORACLE),
    ("cms_heavy_hitters", cms_heavy_hitters, CMS_HEAVY_HITTERS_ORACLE),
]
