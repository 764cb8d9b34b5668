"""RAG / retrieval-serving pack: deterministic hashed text embeddings and
an end-to-end chunk-retrieval pipeline (chunk → embed → search → rank) —
the serving-side twin of the ANN index family in operators/similarity.py.

No embedding model ships in this environment, so the embedder is the
classic **feature-hashing projection** (Weinberger et al. 2009): one md5
per token gives u, and dimension j's weight is the Carter-Wegman mix
``((A_j*u + B_j) mod P) mod 3 - 1`` ∈ {-1, 0, 1} — the same
one-hash-many-seeds trick MinHash uses (operators/dedup.py), so a 16-dim
document embedding costs ONE md5 per token and replays bit-identically in
DuckDB. Swapping in a real encoder is a mapInPandas batch over the same
(id, text) → (id, vec) contract.

All vector math is integer (dims are token-count-bounded sums of ±1), so
dot products and norms are exact in both engines; cosine is rounded to
6 dp BEFORE ranking (the round-before-rank taming from PQ/IVFADC).

Scale notes (100 TB):
- embedding is map-side: tokenize → one md5 → 16 integer sums per key,
  one hash aggregation; no vocabulary table, no model state (that is the
  point of the hashing trick);
- retrieval here is brute-force over chunks with a BROADCAST query side —
  the correct baseline shape for bounded query batches; at corpus scale
  the candidate step swaps for the IVF/LSH bucket joins already in
  operators/similarity.py with the same scoring tail;
- chunking is the map-only sequence+explode from llm_ops2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text, tokens
from ..session import eager_checkpoint, tune
from ..sources import read_table
from .llm_ops2 import CHUNK_LEN, CHUNK_STRIDE

_DIM = 16
_P = 2_147_483_647  # 2^31 - 1, the Carter-Wegman prime shared with MinHash
_NQUERIES = 3
_TOPK = 3

# DuckDB spellings shared with llm_ops3.
_NORM = "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"
_TOKS = "string_split_regex({norm}, '\\s+')"


def _u_col(tok) -> F.Column:
    """One md5 per token → u ∈ [0, P): the seed every dimension mixes.

    Accepts a column NAME (one parsed expression — cheap plan
    construction, see operators/similarity._cosine_cols) or a Column."""
    if isinstance(tok, str):
        return F.expr(
            f"CAST(conv(substring(md5(`{tok}`), 1, 15), 16, 10) AS BIGINT)"
            f" % {_P}"
        )
    return (
        F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long") % _P
    )


_U_SQL = f"CAST(('0x' || substring(md5(tok), 1, 15))::UBIGINT % {_P} AS BIGINT)"


def _dim_weight(j: int) -> F.Column:
    """Dimension j's ±1/0 weight from u (Carter-Wegman mix, fixed odd
    multipliers — literals mirrored in the oracle)."""
    a, b = 2 * j + 3, 5 * j + 7
    return (F.lit(a) * F.col("u") + F.lit(b)) % _P % 3 - 1


def _dim_weight_sql(j: int) -> str:
    a, b = 2 * j + 3, 5 * j + 7
    return f"(({a} * u + {b}) % {_P}) % 3 - 1"


_EMB_ARRAY_SQL = "array(" + ", ".join(f"e{j}" for j in range(_DIM)) + ")"
_NRM_SQL = (
    f"aggregate(transform({_EMB_ARRAY_SQL}, x -> x * x), "
    "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)
#: integer dot of two array<long> columns — ONE parsed expression (same
#: tree as the zip_with/aggregate Column composition, a fraction of its
#: py4j plan-construction cost; all-integer, so no float-order hazard)
_DOT_LONG_SQL = (
    "aggregate(zip_with(`{a}`, `{b}`, (x, y) -> x * y), "
    "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
)


def _embed(tok_df: DataFrame, *keys: str) -> DataFrame:
    """(keys..., tok) → (keys..., emb array<long>, nrm). Rows whose key
    has zero tokens simply don't appear (nothing to embed)."""
    with_u = tok_df.withColumn("u", _u_col("tok"))
    aggs = [
        F.expr(f"sum({_dim_weight_sql(j)})").alias(f"e{j}") for j in range(_DIM)
    ]
    by_key = with_u.groupBy(*keys).agg(*aggs)
    return by_key.select(
        *keys,
        F.expr(_EMB_ARRAY_SQL).alias("emb"),
        F.expr(_NRM_SQL).alias("nrm"),
    )


def _embed_sql(src: str, keys: str, text_expr: str) -> str:
    """CTE text embedding ``src`` (a relation with ``keys`` and a text
    column) the same way: explode tokens, one md5 → u, 16 mixed sums."""
    norm = _NORM.format(col=text_expr)
    toks = _TOKS.format(norm=norm)
    dims = ", ".join(
        f"CAST(sum({_dim_weight_sql(j)}) AS BIGINT)" for j in range(_DIM)
    )
    return f"""
    SELECT {keys}, [{dims}] AS emb
    FROM (SELECT {keys}, {_U_SQL} AS u
          FROM (SELECT {keys}, unnest({toks}) AS tok FROM {src}
                WHERE {norm} <> ''))
    GROUP BY {keys}
"""


def text_hash_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level hashed embeddings: doc_id → 16-dim integer vector +
    its squared norm. The model-free embedder the rest of the RAG pack
    (and any caller wanting semantic features without an encoder) builds
    on. Map-side tokenize → one md5 → one hash aggregation."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.where(normalized_text("text") != "").select(
        "doc_id", F.explode(tokens(normalized_text("text"))).alias("tok")
    )
    # the driver gate hashes scalar cells only — ship the vector as a
    # delimited string (the array form stays internal to the RAG pipeline)
    return _embed(tok, "doc_id").select(
        "doc_id",
        F.array_join(F.col("emb").cast("array<string>"), ",").alias("emb_str"),
        "nrm",
    )


TEXT_EMBED_ORACLE = (
    "SELECT doc_id, array_to_string(emb, ',') AS emb_str, "
    "(SELECT CAST(sum(x.a * x.a) AS BIGINT) FROM (SELECT unnest(emb) AS a) x) AS nrm "
    "FROM (" + _embed_sql("documents", "doc_id", "text") + ")"
)


def rag_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval serving: chunk the corpus (stride 200 / width
    250, llm_ops2's map-only chunker), embed every chunk and the query
    documents (doc_id < 3) with the hashed projection, score exact cosine
    in integer space, return each query's top-3 foreign chunks (own-doc
    chunks excluded — the classic leakage guard). One chunk-side hash
    aggregation, a 3-row broadcast, one top-k window."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    n_chunks_minus1 = F.greatest(
        F.floor((F.col("n_chars") - 1) / F.lit(float(CHUNK_STRIDE))), F.lit(0)
    )
    chunks = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks_minus1)).alias(
            "chunk_id"
        ),
    ).select(
        "doc_id",
        "chunk_id",
        F.expr(
            f"substring(text, cast(chunk_id*{CHUNK_STRIDE}+1 as int), {CHUNK_LEN})"
        ).alias("chunk_text"),
    )
    chunk_tok = chunks.where(normalized_text("chunk_text") != "").select(
        "doc_id",
        "chunk_id",
        F.explode(tokens(normalized_text("chunk_text"))).alias("tok"),
    )
    chunk_emb = _embed(chunk_tok, "doc_id", "chunk_id")

    qdocs = docs.where(F.col("doc_id") < _NQUERIES)
    q_tok = qdocs.where(normalized_text("text") != "").select(
        F.col("doc_id").alias("query_id"),
        F.explode(tokens(normalized_text("text"))).alias("tok"),
    )
    q_emb = _embed(q_tok, "query_id").select(
        "query_id", F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )

    dot = F.expr(_DOT_LONG_SQL.format(a="q_emb", b="emb"))
    scored = (
        chunk_emb.where(F.col("nrm") > 0)
        .crossJoin(F.broadcast(q_emb.where(F.col("q_nrm") > 0)))
        .where(F.col("doc_id") != F.col("query_id"))
        .withColumn("dot", dot)
        .withColumn(
            "cosine",
            F.round(F.col("dot") / (F.sqrt("q_nrm") * F.sqrt("nrm")), 6),
        )
    )
    # Scalable exact top-k: a single window partitioned by the (tiny)
    # query set would funnel the ENTIRE scored corpus through ≤_NQUERIES
    # sort tasks — at 100 TB each task sorts ~|chunks| rows. Exact top-k
    # decomposes: every input partition keeps its local top-k first
    # (bounded by partition size), then the global rank sees only
    # ≤ k·partitions survivors. Same values, same tie-break.
    order = [F.col("cosine").desc(), F.col("doc_id"), F.col("chunk_id")]
    w_local = Window.partitionBy("query_id", "_pid").orderBy(*order)
    w_global = Window.partitionBy("query_id").orderBy(*order)
    survivors = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("lrk", F.row_number().over(w_local))
        .where(F.col("lrk") <= _TOPK)
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w_global))
        .where(F.col("rk") <= _TOPK)
        .select(
            "query_id", F.col("rk").alias("rank"), "doc_id", "chunk_id", "cosine"
        )
    )


_CHUNKS_SQL = f"""
    SELECT doc_id, chunk_id,
           substring(text, CAST(chunk_id*{CHUNK_STRIDE}+1 AS INT), {CHUNK_LEN}) AS chunk_text
    FROM (SELECT doc_id, text,
                 unnest(generate_series(0,
                     greatest(CAST(floor((n_chars-1)/{CHUNK_STRIDE}.0) AS BIGINT), 0))) AS chunk_id
          FROM documents WHERE n_chars > 0) t
"""

RAG_RETRIEVAL_ORACLE = f"""
WITH chunks AS ({_CHUNKS_SQL}
), chunk_emb AS ({_embed_sql("chunks", "doc_id, chunk_id", "chunk_text")}
), q_emb AS ({_embed_sql("(SELECT * FROM documents WHERE doc_id < {nq} AND n_chars > 0)".format(nq=_NQUERIES), "doc_id", "text")}
), scored AS (
    SELECT q.doc_id AS query_id, c.doc_id, c.chunk_id,
           round((SELECT sum(x.a * x.b)
                  FROM (SELECT unnest(q.emb) AS a, unnest(c.emb) AS b) x)
                 / (sqrt((SELECT sum(x.a * x.a)
                          FROM (SELECT unnest(q.emb) AS a) x))
                    * sqrt((SELECT sum(x.a * x.a)
                            FROM (SELECT unnest(c.emb) AS a) x))), 6) AS cosine
    FROM q_emb q, chunk_emb c
    WHERE q.doc_id <> c.doc_id
      AND (SELECT sum(x.a * x.a) FROM (SELECT unnest(q.emb) AS a) x) > 0
      AND (SELECT sum(x.a * x.a) FROM (SELECT unnest(c.emb) AS a) x) > 0
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, chunk_id, cosine FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, doc_id, chunk_id) AS rank
    FROM scored) WHERE rank <= {_TOPK}
"""

def retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline retrieval evaluation — the metrics job every RAG/search
    deployment runs on its eval set: per query, precision@k against a
    relevance oracle (here: a retrieved chunk is relevant iff its
    document shares the query document's `source`). Composes the full
    retrieval pipeline and joins the two metadata lookups broadcast;
    precision reported in integer thousandths (floor) so the metric is
    cross-engine exact.

    Scale: the eval set is query-batch-sized — everything after the
    retrieval pipeline is broadcast joins over top-k rows."""
    tune(spark)
    res = rag_retrieval_pipeline(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    q_src = docs.select(
        F.col("doc_id").alias("query_id"), F.col("source").alias("q_source")
    )
    c_src = docs.select("doc_id", F.col("source").alias("c_source"))
    return (
        res.join(F.broadcast(q_src), "query_id")
        .join(F.broadcast(c_src), "doc_id")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("k"),
            F.sum(
                F.when(F.col("q_source") == F.col("c_source"), 1).otherwise(0)
            ).alias("hits"),
        )
        .withColumn(
            "precision_milli",
            F.floor(F.col("hits") * 1000 / F.col("k")).cast("long"),
        )
    )


RETRIEVAL_EVAL_ORACLE = f"""
WITH rag AS (
    SELECT * FROM ({RAG_RETRIEVAL_ORACLE})
)
SELECT r.query_id, count(*) AS k,
       CAST(sum(CASE WHEN dq.source = dc.source THEN 1 ELSE 0 END) AS BIGINT)
           AS hits,
       CAST(floor(sum(CASE WHEN dq.source = dc.source THEN 1 ELSE 0 END)
                  * 1000.0 / count(*)) AS BIGINT) AS precision_milli
FROM rag r
JOIN documents dq ON dq.doc_id = r.query_id
JOIN documents dc ON dc.doc_id = r.doc_id
GROUP BY r.query_id
"""

def retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k for the retrieval pipeline — the graded companion to
    precision@k (binary gains here: a chunk is relevant iff its document
    shares the query's LANGUAGE — the coarser label the hashed embedder
    actually recovers, so the metric is non-degenerate where the
    source-match precision floor sits at zero). DCG discounts each hit
    by log2(rank+1), crediting each relevant DOCUMENT only once — the
    retrieved list is chunks, and without per-doc dedup a query whose
    top-k held several chunks of one relevant doc accumulated more gain
    than the doc-count-capped ideal allows (NDCG > 1, an invalid value
    both engines agreed on, so the parity gate could never catch it).
    IDCG is the ideal prefix
    ``sum_{i<=min(k, R)} 1/log2(i+1)`` with R = the query's total
    relevant-doc count in the corpus (own doc excluded), so a query
    whose language has fewer than k foreign docs is not penalized for
    physics; first-occurrence gains at ranks r_1<r_2<… are bounded by
    that prefix term-by-term (r_i >= i), so ndcg <= 1 always. A query with ZERO relevant docs (singleton language) has an
    undefined ideal ranking, so its ndcg is NULL — guarded explicitly,
    because under ANSI mode an unguarded ``1/log2(0+1)`` in the IDCG
    fold throws DIVIDE_BY_ZERO (and DuckDB's empty ``generate_series``
    would yield NULL anyway, so NULL is also the parity answer).
    Rounded to 6 dp.

    Scale: everything after the retrieval pipeline is broadcast joins
    and per-query aggregation over top-k rows; R comes from a
    sources-sized broadcast count."""
    tune(spark)
    res = rag_retrieval_pipeline(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    q_lang = docs.select(
        F.col("doc_id").alias("query_id"), F.col("lang").alias("q_lang")
    )
    c_lang = docs.select("doc_id", F.col("lang").alias("c_lang"))
    lang_sizes = docs.groupBy("lang").agg(F.count("*").alias("n_lang"))
    rel = (
        res.join(F.broadcast(q_lang), "query_id")
        .join(F.broadcast(c_lang), "doc_id")
        .join(
            F.broadcast(lang_sizes),
            F.col("q_lang") == F.col("lang"),
        )
        .withColumn(
            "occ",
            F.row_number().over(
                Window.partitionBy("query_id", "doc_id").orderBy("rank")
            ),
        )
        .withColumn(
            "gain",
            F.when(
                (F.col("q_lang") == F.col("c_lang")) & (F.col("occ") == 1),
                1.0,
            ).otherwise(0.0),
        )
    )
    per_q = rel.groupBy("query_id").agg(
        F.count("*").alias("k"),
        F.sum(F.col("gain") / F.log2(F.col("rank") + 1)).alias("dcg"),
        # R = same-source docs minus the query itself
        (F.first("n_lang") - 1).alias("n_relevant"),
    )
    ideal_len = F.least("k", "n_relevant")
    # Clamp the sequence bound to >= 1: F.sequence(1, 0) is DESCENDING
    # [1, 0] in Spark and the fold would hit log2(1) = 0. The clamped
    # branch is only read when ideal_len >= 1 (If evaluates lazily), but
    # never building a descending sequence keeps the expression total.
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.greatest(ideal_len, F.lit(1))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1),
    )
    return per_q.select(
        "query_id",
        F.col("k").cast("int").alias("k"),
        F.col("n_relevant").cast("long").alias("n_relevant"),
        F.when(ideal_len >= 1, F.round(F.col("dcg") / idcg, 6)).alias("ndcg"),
    )


RETRIEVAL_NDCG_ORACLE = f"""
WITH rag AS (
    SELECT * FROM ({{rag}})
), rel AS (
    -- each relevant DOCUMENT credited once (occ = 1), mirroring the
    -- Spark side: repeat chunks of one doc must not inflate DCG past
    -- the doc-count-capped ideal
    SELECT r.query_id, r.rank,
           CASE WHEN dq.lang = dc.lang
                     AND row_number() OVER (
                         PARTITION BY r.query_id, r.doc_id ORDER BY r.rank
                     ) = 1
                THEN 1.0 ELSE 0.0 END AS gain,
           (SELECT count(*) FROM documents s WHERE s.lang = dq.lang) - 1
               AS n_relevant
    FROM rag r
    JOIN documents dq ON dq.doc_id = r.query_id
    JOIN documents dc ON dc.doc_id = r.doc_id
), per_q AS (
    SELECT query_id, count(*) AS k,
           sum(gain / log2(rank + 1)) AS dcg,
           min(n_relevant) AS n_relevant
    FROM rel GROUP BY query_id
)
SELECT query_id, CAST(k AS INT) AS k,
       CAST(n_relevant AS BIGINT) AS n_relevant,
       CASE WHEN least(k, n_relevant) >= 1 THEN
           round(dcg / (SELECT sum(1.0 / log2(i + 1))
                        FROM unnest(generate_series(1, CAST(least(k, n_relevant) AS BIGINT))) AS t(i)),
                 6)
       END AS ndcg
FROM per_q
""".replace("{rag}", RAG_RETRIEVAL_ORACLE)


QUERY_TERMS = ("vector", "stream", "window")  # the fixed lexical query
# terms are interpolated into SQL string literals below (sum(CASE WHEN
# tok = '{t}' ...)); a quote/backslash would break the parse or shift
# semantics silently, so pin the invariant where the constant lives
assert all(t.isalnum() for t in QUERY_TERMS), "QUERY_TERMS must be alphanumeric"
_K1, _B = 1.2, 0.75  # standard BM25 constants
_BM25_TOPK = 10
_RRF_K = 60  # reciprocal-rank-fusion damping (Cormack et al. 2009)
_FUSE_DEPTH = 20  # per-retriever candidate depth fused by RRF


def _doc_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BM25 inputs in ONE aggregation pass: doc length (tokens)
    and the query-term frequencies. Materialized (C1) because both the
    global stats broadcast and the scoring pass consume it — without it
    the tokenize lineage would execute twice. localCheckpoint rather
    than cache() so repeated bm25/hybrid invocations in a long-lived
    session don't each leak an InMemoryRelation (checkpoint blocks are
    freed by the ContextCleaner when the frame is GC'd; this is the same
    deliberate choice mmr_diverse_topk makes)."""
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.where(normalized_text("text") != "").select(
        "doc_id", F.explode(tokens(normalized_text("text"))).alias("tok")
    )
    aggs = [F.count("*").alias("dl")] + [
        F.expr(f"sum(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END)").alias(f"tf{i}")
        for i, t in enumerate(QUERY_TERMS)
    ]
    return eager_checkpoint(tok.groupBy("doc_id").agg(*aggs), "bm25_doc_stats")


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dl, bm25) for every doc with a positive BM25 score —
    the shared scoring core of bm25_retrieval and the hybrid fusion.
    Corpus stats (N, df_t, avgdl) are a 1-row broadcast off the cached
    per-doc frame; scoring is map-side; scores round to 6 dp BEFORE any
    ranking (the repo's round-before-rank taming; ln/division are the
    only float steps)."""
    return _bm25_from_stats(_doc_term_stats(spark, sf_dir))


def _bm25_from_stats(stats: DataFrame) -> DataFrame:
    """BM25 scoring tail over a per-doc (dl, tf0..tfk) stats frame;
    extra columns (e.g. the hybrid's embedding dims) pass through
    untouched and get pruned by the caller's select."""
    glob_aggs = [
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ] + [
        F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
        for i in range(len(QUERY_TERMS))
    ]
    glob = stats.agg(*glob_aggs)
    scored = stats.crossJoin(F.broadcast(glob))
    score = None
    for i in range(len(QUERY_TERMS)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
            + 1.0
        )
        tf = F.col(f"tf{i}")
        term = idf * (
            tf * (_K1 + 1)
            / (tf + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
        )
        score = term if score is None else score + term
    return scored.withColumn("bm25", F.round(score, 6)).where(F.col("bm25") > 0)


def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Robertson-Spärck Jones probabilistic
    ranking, the Lucene ``+1`` idf variant) for a fixed query — the
    lexical baseline every hybrid RAG stack runs beside dense retrieval.

    Scale: one tokenize + one per-doc aggregation (see _bm25_scored);
    TakeOrderedAndProject for the top-k. At production scale the
    per-term postings come from an inverted index, but the scoring tail
    is identical."""
    tune(spark)
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_BM25_TOPK)
        .select("doc_id", "bm25", F.col("dl").cast("long").alias("dl"))
    )


def _bm25_oracle_cte(depth: int) -> str:
    norm = _NORM.format(col="text")
    toks = _TOKS.format(norm=norm)
    tf_cols = ", ".join(
        f"CAST(sum(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}"
        for i, t in enumerate(QUERY_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(QUERY_TERMS))
    )
    terms = " + ".join(
        f"ln((n_docs - df{i} + 0.5) / (df{i} + 0.5) + 1.0)"
        f" * (tf{i} * ({_K1} + 1) / (tf{i} + {_K1} * (1 - {_B} + {_B} * dl / avgdl)))"
        for i in range(len(QUERY_TERMS))
    )
    return f"""
stats AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS dl, {tf_cols}
    FROM (SELECT doc_id, unnest({toks}) AS tok FROM documents
          WHERE {norm} <> '')
    GROUP BY doc_id
), cstats AS (
    SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_cols} FROM stats
), scored AS (
    SELECT doc_id, dl, round({terms}, 6) AS bm25
    FROM stats, cstats
)
, bm25_top AS (
    SELECT doc_id, bm25, dl FROM scored WHERE bm25 > 0
    ORDER BY bm25 DESC, doc_id LIMIT {depth}
)"""


BM25_ORACLE = f"""
WITH {_bm25_oracle_cte(_BM25_TOPK)}
SELECT doc_id, bm25, dl FROM bm25_top
"""


def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al.
    2009) of the BM25 lexical ranking and the dense hashed-embedding
    cosine ranking for the same query — the standard way production RAG
    merges sparse and dense retrievers without score calibration
    (``sum 1/(k + rank)`` over the lists a doc appears in).

    Both candidate lists are depth-20; fusion is a full-outer join on
    doc_id over two 20-row frames — nothing data-sized happens after the
    two retrievals. RRF scores round to 6 dp, ties on doc_id.

    Physical shape: the lexical stats (dl, per-term tf) and the hashed
    embedding dims come out of ONE tokenize → explode → per-doc hash
    aggregation (a single corpus pass and a single shuffle), checkpointed
    once; the BM25 branch and the cosine branch both read the per-doc
    frame (one row per doc — reduction-sized, not corpus-sized). Values
    are identical to computing the two branches from separate scans:
    every shared column is an integer sum over the same exploded rows."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.where(normalized_text("text") != "").select(
        "doc_id", F.explode(tokens(normalized_text("text"))).alias("tok")
    )
    with_u = tok.withColumn("u", _u_col("tok"))
    aggs = (
        [F.count("*").alias("dl")]
        + [
            F.expr(f"sum(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END)").alias(f"tf{i}")
            for i, t in enumerate(QUERY_TERMS)
        ]
        + [F.expr(f"sum({_dim_weight_sql(j)})").alias(f"e{j}") for j in range(_DIM)]
    )
    per_doc = eager_checkpoint(
        with_u.groupBy("doc_id").agg(*aggs), "hybrid_doc_stats"
    )

    lex = (
        _bm25_from_stats(per_doc)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_FUSE_DEPTH)
        .withColumn(
            "lex_rank",
            F.row_number().over(Window.orderBy(F.col("bm25").desc(), "doc_id")),
        )
        .select("doc_id", "lex_rank")
    )

    doc_emb = per_doc.select(
        "doc_id",
        F.expr(_EMB_ARRAY_SQL).alias("emb"),
        F.expr(_NRM_SQL).alias("nrm"),
    )
    qdf = spark.createDataFrame(
        [(0, " ".join(QUERY_TERMS))], "qid int, text string"
    )
    q_tok = qdf.select("qid", F.explode(tokens(normalized_text("text"))).alias("tok"))
    q_emb = _embed(q_tok, "qid").select(
        F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    dot = F.expr(_DOT_LONG_SQL.format(a="q_emb", b="emb"))
    sem = (
        doc_emb.where(F.col("nrm") > 0)
        .crossJoin(F.broadcast(q_emb.where(F.col("q_nrm") > 0)))
        .withColumn("dot", dot)
        .where(F.col("dot") > 0)
        .withColumn(
            "cosine", F.round(F.col("dot") / (F.sqrt("q_nrm") * F.sqrt("nrm")), 6)
        )
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(_FUSE_DEPTH)
        .withColumn(
            "sem_rank",
            F.row_number().over(Window.orderBy(F.col("cosine").desc(), "doc_id")),
        )
        .select("doc_id", "sem_rank")
    )
    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("sem_rank")), F.lit(0.0)),
        6,
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .withColumn("rrf_score", rrf)
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(_BM25_TOPK)
        .select(
            "doc_id",
            "rrf_score",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("sem_rank").cast("int").alias("sem_rank"),
        )
    )


def _hybrid_oracle() -> str:
    norm = _NORM.format(col="text")
    return f"""
WITH {_bm25_oracle_cte(_FUSE_DEPTH)}
, lex AS (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS lex_rank
    FROM bm25_top
), demb AS ({_embed_sql("documents", "doc_id", "text")}),
dnrm AS (
    SELECT doc_id, emb,
           (SELECT CAST(sum(x.a * x.a) AS BIGINT)
            FROM (SELECT unnest(emb) AS a) x) AS nrm
    FROM demb
), q AS (
    SELECT emb AS q_emb,
           (SELECT CAST(sum(x.a * x.a) AS BIGINT)
            FROM (SELECT unnest(emb) AS a) x) AS q_nrm
    FROM ({_embed_sql(
        f"(SELECT 0 AS qid, '{' '.join(QUERY_TERMS)}' AS text)", "qid", "text"
    )})
), sem_scored AS (
    SELECT d.doc_id,
           round((SELECT sum(x.a * x.b)
                  FROM (SELECT unnest(d.emb) AS a, unnest(q.q_emb) AS b) x)
                 / (sqrt(q.q_nrm) * sqrt(d.nrm)), 6) AS cosine,
           (SELECT sum(x.a * x.b)
            FROM (SELECT unnest(d.emb) AS a, unnest(q.q_emb) AS b) x) AS dot
    FROM dnrm d, q
    WHERE d.nrm > 0 AND q.q_nrm > 0
), sem AS (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS sem_rank
    FROM (SELECT * FROM sem_scored WHERE dot > 0
          ORDER BY cosine DESC, doc_id LIMIT {_FUSE_DEPTH})
)
SELECT doc_id,
       round(coalesce(1.0 / ({_RRF_K} + lex_rank), 0)
             + coalesce(1.0 / ({_RRF_K} + sem_rank), 0), 6) AS rrf_score,
       lex_rank, sem_rank
FROM lex FULL OUTER JOIN sem USING (doc_id)
ORDER BY rrf_score DESC, doc_id LIMIT {_BM25_TOPK}
"""


HYBRID_RRF_ORACLE = _hybrid_oracle()


REGISTRY: list[tuple] = [
    ("text_hash_embeddings", text_hash_embeddings, TEXT_EMBED_ORACLE),
    ("rag_retrieval_pipeline", rag_retrieval_pipeline, RAG_RETRIEVAL_ORACLE),
    ("retrieval_eval_metrics", retrieval_eval_metrics, RETRIEVAL_EVAL_ORACLE),
    ("bm25_retrieval", bm25_retrieval, BM25_ORACLE),
    ("hybrid_retrieval_rrf", hybrid_retrieval_rrf, HYBRID_RRF_ORACLE),
    ("retrieval_ndcg", retrieval_ndcg, RETRIEVAL_NDCG_ORACLE),
]
