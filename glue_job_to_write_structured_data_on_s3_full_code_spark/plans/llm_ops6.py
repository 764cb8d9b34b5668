"""LLM training-data pipeline pack 6 — the "last mile" between a curated
corpus and the trainer, plus retrieval diversity and clustering evaluation:
deterministic shard export (the epoch shuffle), per-source token-budget
enforcement, MMR-diversified top-k retrieval, and k-means label purity.

Design rules (same as llm_ops2..5): pure JVM expressions, no Python
boundary; every random decision derives from md5 of a stable key so reruns
and the DuckDB oracle reproduce the same rows; embedding math runs in the
integer-quantized space established by llm_ops5 (floor(x*1000) BIGINTs),
with cosines rounded to 6 dp BEFORE any ranking (the PQ tie-break taming).

Reference parity: the reference (a CRM ETL Glue job, FULL.py) has no
training-export or retrieval surface; this pack is north-star extension
material on the synthetic `documents` / `embeddings` tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text, token_count
from ..session import eager_checkpoint, tune
from ..sources import read_table
from .llm_ops4 import _TOKCNT  # DuckDB spelling of token_count — ONE copy
from .llm_ops5 import (
    EMBEDDING_KMEANS_ORACLE,
    _QV_SQL,
    _qvecs,
    embedding_kmeans,
)

N_SHARDS = 8
TOKEN_BUDGET = 5000  # per-source token cap for the budgeted mix
_SHORTLIST = 10  # ANN shortlist MMR reranks
_MMR_K = 3  # diversified picks
# Exact greedy MMR unrolls as k sequential 1-row picks, each cross-joined
# (broadcast) into the next round's candidates — and each pick's plan
# EMBEDS every prior pick's plan, so total plan size is EXPONENTIAL in k
# (measured ~2× analysis time per extra pick: 1.8s at k=6, 6.8s at k=8 on
# local[32]). Catalyst ANALYSIS, not execution, is the bottleneck. Cap
# the unroll; above the cap, :func:`mmr_rerank_collected` collects the
# (shortlist-sized, bounded by construction) rows and runs the same
# greedy loop driver-side — :func:`mmr_topk_from_shortlist` dispatches.
_MMR_MAX_K = 8
_LAMBDA = 0.7  # MMR relevance weight
# penalty weight as the EXACT double both engines multiply by: 1 - 0.7 is
# the double 0.30000000000000004, round(.., 10) is 0.3 — the oracle bakes
# in the rounded literal, so the Spark side must use the same constant
_MU = round(1 - _LAMBDA, 10)


def training_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment + epoch shuffle for training export.

    Trainers want the corpus split into N equal-ish shard files whose
    *within-shard order is a global shuffle* — but a true global shuffle
    (ORDER BY rand()) is a full sort and non-reproducible. The standard
    scalable recipe: shard = hash(doc) mod N (uniform, no skew), order
    within a shard by a second hash (the md5 draw IS the shuffle). Each
    shard sorts independently — at 100 TB, N is picked so a shard is one
    output file (~1 GB), and the per-shard window becomes
    ``repartition(N, shard) + sortWithinPartitions`` with zero cross-shard
    coordination. One shuffle total.

    Output: one row per doc with its shard, position-in-shard, and token
    count (the per-shard token sums a manifest needs are one groupBy away).
    """
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    draw = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|epoch0")))
    shard = (
        F.conv(F.substring(F.col("draw"), 1, 15), 16, 10).cast("long") % N_SHARDS
    )
    w = Window.partitionBy("shard_id").orderBy("draw", "doc_id")
    return (
        docs.select("doc_id", token_count("text").alias("n_tok"), draw.alias("draw"))
        .withColumn("shard_id", shard.cast("int"))
        .withColumn("pos_in_shard", F.row_number().over(w))
        .select("doc_id", "shard_id", "pos_in_shard", "n_tok")
    )


TRAINING_SHARD_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           CAST({_TOKCNT} AS INT) AS n_tok,
           md5(CAST(doc_id AS VARCHAR) || '|epoch0') AS draw
    FROM documents
), s AS (
    SELECT doc_id, n_tok, draw,
           CAST(('0x' || substring(draw, 1, 15))::UBIGINT % {N_SHARDS} AS INT)
               AS shard_id
    FROM t
)
SELECT doc_id, shard_id,
       CAST(row_number() OVER (PARTITION BY shard_id ORDER BY draw, doc_id)
            AS INT) AS pos_in_shard,
       n_tok
FROM s
"""


def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget enforcement: keep a uniform random prefix
    of each source until its token budget is spent.

    The mixing recipe "X tokens of source A, Y of source B" (Pile-style
    per-set epochs) needs an operator that *stops sampling a source at a
    token count*, not a row count. Docs are ordered by an md5 draw (the
    uniform sample), the running token total is a per-source window
    cumsum, and a doc survives iff its cumulative total (inclusive) fits
    the budget — so the output is reproducible and the budget is never
    overshot by more than zero docs. One shuffle (the per-source window);
    at 100 TB the window key extends to (source, shard) exactly like
    sequence_packing, then per-shard budgets = budget / n_shards.
    """
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    draw = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|mix")))
    w = (
        Window.partitionBy("source")
        .orderBy("draw", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = docs.select(
        "source", "doc_id", token_count("text").alias("n_tok"), draw.alias("draw")
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tok").over(w))
        .where(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("source", "doc_id", "n_tok", "cum_tokens")
    )


TOKEN_BUDGET_ORACLE = f"""
WITH t AS (
    SELECT source, doc_id,
           CAST({_TOKCNT} AS INT) AS n_tok,
           md5(CAST(doc_id AS VARCHAR) || '|mix') AS draw
    FROM documents
), c AS (
    SELECT source, doc_id, n_tok,
           sum(n_tok) OVER (PARTITION BY source ORDER BY draw, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
    FROM t
)
SELECT source, doc_id, n_tok, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
"""


def _cosine(u_vec: str, v_vec: str, u_nrm: str, v_nrm: str) -> F.Column:
    """Exact cosine from integer dot/norms, rounded to 6 dp before any
    comparison (cross-engine-stable away from 1e-6 ties, which the
    deterministic vec_id tie-break then absorbs)."""
    dot = F.aggregate(
        F.zip_with(u_vec, v_vec, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.round(dot / (F.sqrt(u_nrm) * F.sqrt(v_nrm)), 6)


def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998) —
    the standard diversity pass retrieval stacks run AFTER ANN: take the
    shortlist, then greedily pick argmax of
    ``lambda * rel(c) - (1 - lambda) * max_{s in picked} sim(c, s)``.

    Query = vec 0; shortlist = its top-10 exact-cosine neighbors
    (TakeOrderedAndProject — no global sort materializes); the three MMR
    picks are unrolled as three 1-row broadcast joins, so the whole rerank
    is a constant-depth plan over a k-row frame. At scale the shortlist
    per query comes from the ANN family (IVF/PQ) and MMR cost is
    O(shortlist * k) per query — independent of corpus size. All scores
    in the quantized integer space, rounded before ranking. The unroll is
    hard-capped at ``_MMR_MAX_K`` picks (plan size is exponential in k;
    see :func:`_mmr_picks`); above the cap
    :func:`mmr_topk_from_shortlist` switches to the driver-side exact
    rerank over the collected (bounded) shortlist.
    """
    tune(spark)
    shortlist = _mmr_shortlist(spark, sf_dir)
    return mmr_topk_from_shortlist(shortlist, _MMR_K)


def _mmr_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN-stand-in shortlist MMR reranks: query = vec 0, its top
    ``_SHORTLIST`` exact-cosine neighbors as (vec_id, qv, nrm, rel)."""
    vecs = _qvecs(spark, sf_dir)
    nrm = F.aggregate(
        F.transform("qv", lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    with_norm = vecs.withColumn("nrm", nrm).where(F.col("nrm") > 0)
    q = with_norm.where(F.col("vec_id") == 0).select(
        F.col("qv").alias("q_qv"), F.col("nrm").alias("q_nrm")
    )
    scored = (
        with_norm.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .withColumn("rel", _cosine("q_qv", "qv", "q_nrm", "nrm"))
        .select("vec_id", "qv", "nrm", "rel")
    )
    # localCheckpoint, not cache(): the k-row shortlist is materialized
    # once (the scored scan never re-runs per pick) WITHOUT registering an
    # InMemoryRelation in the session catalog — a cache here outlives the
    # query and pollutes later plan inspections of identical subtrees
    # (ContextCleaner reclaims checkpointed blocks when the frame is GC'd)
    return eager_checkpoint(
        scored.orderBy(F.col("rel").desc(), "vec_id").limit(_SHORTLIST),
        "mmr_shortlist",
    )


def mmr_topk_from_shortlist(shortlist: DataFrame, k: int) -> DataFrame:
    """Greedy MMR over a (vec_id, qv, nrm, rel) shortlist → one row per
    pick (rank, vec_id, relevance).  Dispatches on k: the constant-depth
    plan unroll while the plan stays small (k ≤ ``_MMR_MAX_K``), the
    driver-side exact rerank above it — same picks either way (the
    shortlist is bounded by construction, so collecting it is O(k), not
    O(corpus))."""
    if k <= _MMR_MAX_K:
        picks = _mmr_picks(shortlist, k)
        out = None
        for rank, p in enumerate(picks, start=1):
            row = p.select(
                F.lit(rank).cast("int").alias("rank"),
                "vec_id",
                F.col("rel").alias("relevance"),
            )
            out = row if out is None else out.unionByName(row)
        return out
    return mmr_rerank_collected(shortlist, k)


def mmr_rerank_collected(shortlist: DataFrame, k: int) -> DataFrame:
    """Driver-side exact greedy MMR — the supported path for k above
    ``_MMR_MAX_K``, where the plan unroll's Catalyst analysis time
    explodes.  Collects the shortlist (bounded at ``_SHORTLIST`` rows per
    query by construction — this is O(shortlist), never O(corpus)) and
    runs the identical greedy argmax loop in Python: integer dot products
    are exact, the cosine and the MMR score round to 6 dp before every
    compare, and ties break on vec_id ascending — the same contract as
    :func:`_cosine` / :func:`_mmr_picks` / the DuckDB oracle, so the
    picks match the unrolled plan for overlapping k (asserted in
    tests/test_llm_ops6.py)."""
    import math

    spark = shortlist.sparkSession
    rows = shortlist.select("vec_id", "qv", "nrm", "rel").collect()
    cands = [(r["vec_id"], list(r["qv"]), r["nrm"], float(r["rel"])) for r in rows]

    def cos(u: tuple, v: tuple) -> float:
        dot = sum(a * b for a, b in zip(u[1], v[1]))  # exact int arithmetic
        return round(dot / (math.sqrt(u[2]) * math.sqrt(v[2])), 6)

    picks: list[tuple] = []
    remaining = sorted(cands, key=lambda c: (-c[3], c[0]))  # pure relevance
    if remaining:
        picks.append(remaining.pop(0))
    while remaining and len(picks) < k:
        def mmr_score(c: tuple) -> float:
            div = max(cos(p, c) for p in picks)
            return round(_LAMBDA * c[3] - _MU * div, 6)

        remaining.sort(key=lambda c: (-mmr_score(c), c[0]))
        picks.append(remaining.pop(0))
    return spark.createDataFrame(
        [(i + 1, p[0], p[3]) for i, p in enumerate(picks)],
        "rank int, vec_id bigint, relevance double",
    )


def _mmr_picks(shortlist: DataFrame, k: int) -> list[DataFrame]:
    """The greedy MMR unroll over a (vec_id, qv, nrm, rel) shortlist.
    Refuses k above ``_MMR_MAX_K``: each pick cross-joins every prior
    pick AND embeds every prior pick's plan, so plan size (and Catalyst
    analysis time) is exponential in k — it blows up long before
    execution does."""
    if k > _MMR_MAX_K:
        raise ValueError(
            f"exact MMR plan unroll is capped at k={_MMR_MAX_K} (plan size "
            f"is exponential in k; analysis time explodes beyond the cap); "
            f"got k={k} — use mmr_rerank_collected (or the "
            f"mmr_topk_from_shortlist dispatcher, which switches "
            f"automatically) for larger k"
        )
    picks: list[DataFrame] = []
    # pick 1: pure relevance
    s1 = shortlist.orderBy(F.col("rel").desc(), "vec_id").limit(1)
    picks.append(s1)
    remaining = shortlist
    for step in range(2, k + 1):
        remaining = remaining.join(
            F.broadcast(picks[-1].select(F.col("vec_id").alias("p_id"))),
            F.col("vec_id") == F.col("p_id"),
            "left_anti",
        )
        # diversity penalty: max cosine against every pick so far
        div_cols = []
        cand = remaining
        for i, p in enumerate(picks):
            pi = F.broadcast(
                p.select(
                    F.col("qv").alias(f"p{i}_qv"), F.col("nrm").alias(f"p{i}_nrm")
                )
            )
            cand = cand.crossJoin(pi)
            div_cols.append(_cosine(f"p{i}_qv", "qv", f"p{i}_nrm", "nrm"))
        div = div_cols[0] if len(div_cols) == 1 else F.greatest(*div_cols)
        cand = cand.withColumn(
            "mmr", F.round(F.lit(_LAMBDA) * F.col("rel") - F.lit(_MU) * div, 6)
        )
        nxt = (
            cand.orderBy(F.col("mmr").desc(), "vec_id")
            .limit(1)
            .select("vec_id", "qv", "nrm", "rel")
        )
        picks.append(nxt)
    return picks


def _mmr_oracle() -> str:
    lam, mu = _LAMBDA, _MU
    cos = (
        "round((SELECT sum(x.a * x.b) FROM (SELECT unnest({u}.qv) AS a, "
        "unnest({v}.qv) AS b) x) / (sqrt({u}.nrm) * sqrt({v}.nrm)), 6)"
    )
    return f"""
WITH qv0 AS (
    SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
), wn AS (
    SELECT vec_id, qv,
           (SELECT sum(x.a * x.a) FROM (SELECT unnest(qv) AS a) x) AS nrm
    FROM qv0
), q AS (
    SELECT qv, nrm FROM wn WHERE vec_id = 0 AND nrm > 0
), scored AS (
    SELECT c.vec_id, c.qv, c.nrm,
           {cos.format(u='q', v='c')} AS rel
    FROM wn c, q
    WHERE c.vec_id <> 0 AND c.nrm > 0
), shortlist AS (
    SELECT * FROM scored ORDER BY rel DESC, vec_id LIMIT {_SHORTLIST}
), s1 AS (
    SELECT * FROM shortlist ORDER BY rel DESC, vec_id LIMIT 1
), step2 AS (
    SELECT c.vec_id, c.qv, c.nrm, c.rel,
           round({lam} * c.rel - {mu} * {cos.format(u='p0', v='c')}, 6) AS mmr
    FROM shortlist c, s1 p0
    WHERE c.vec_id <> p0.vec_id
), s2 AS (
    SELECT vec_id, qv, nrm, rel FROM step2 ORDER BY mmr DESC, vec_id LIMIT 1
), step3 AS (
    SELECT c.vec_id, c.rel,
           round({lam} * c.rel - {mu} * greatest(
               {cos.format(u='p0', v='c')},
               {cos.format(u='p1', v='c')}), 6) AS mmr
    FROM shortlist c, s1 p0, s2 p1
    WHERE c.vec_id <> p0.vec_id AND c.vec_id <> p1.vec_id
), s3 AS (
    SELECT vec_id, rel FROM step3 ORDER BY mmr DESC, vec_id LIMIT 1
)
SELECT CAST(1 AS INT) AS rank, vec_id, rel AS relevance FROM s1
UNION ALL
SELECT CAST(2 AS INT) AS rank, vec_id, rel AS relevance FROM s2
UNION ALL
SELECT CAST(3 AS INT) AS rank, vec_id, rel AS relevance FROM s3
"""


MMR_ORACLE = _mmr_oracle()


def kmeans_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering evaluation: per-cluster size, majority label, and purity
    (majority count / cluster size) for the embedding_kmeans assignment
    against the fixture's ground-truth ``label`` column — the check a
    curation pipeline runs before trusting cluster-level decisions
    (SemDeDup drops, per-cluster sampling). Purity is the standard
    external metric; computing it is two hash aggregations and a top-1
    window on the (cluster, label) contingency frame, which has at most
    K * n_labels rows regardless of corpus size."""
    tune(spark)
    assigned = embedding_kmeans(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    contingency = (
        assigned.join(emb, "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("cluster").orderBy(F.col("n").desc(), "label")
    totals = contingency.groupBy("cluster").agg(F.sum("n").alias("cluster_size"))
    majority = (
        contingency.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("cluster", F.col("label").alias("majority_label"), F.col("n").alias("majority_n"))
    )
    return (
        totals.join(majority, "cluster")
        .select(
            "cluster",
            F.col("cluster_size").cast("long").alias("cluster_size"),
            "majority_label",
            F.round(F.col("majority_n") / F.col("cluster_size"), 6).alias("purity"),
        )
    )


KMEANS_PURITY_ORACLE = f"""
WITH k AS (
    SELECT * FROM ({EMBEDDING_KMEANS_ORACLE})
), cont AS (
    SELECT k.cluster, e.label, count(*) AS n
    FROM k JOIN embeddings e ON e.vec_id = k.vec_id
    GROUP BY 1, 2
), tot AS (
    SELECT cluster, CAST(sum(n) AS BIGINT) AS cluster_size FROM cont GROUP BY 1
), maj AS (
    SELECT cluster, label AS majority_label, n AS majority_n FROM (
        SELECT *, row_number() OVER (PARTITION BY cluster
                                     ORDER BY n DESC, label) AS rk
        FROM cont) WHERE rk = 1
)
SELECT t.cluster, t.cluster_size, m.majority_label,
       round(m.majority_n / t.cluster_size, 6) AS purity
FROM tot t JOIN maj m USING (cluster)
"""


_INCOMING_SOURCE = "src5"  # the "today's crawl" batch (has head-fp overlaps)
_PREFIX_TOKENS = 30  # head-fingerprint width


def _head_key(col) -> F.Column:
    """First `_PREFIX_TOKENS` tokens of the canonical normalized form —
    built on functions.text.normalized_text so every fingerprint in the
    repo derives from the ONE normalization definition."""
    return F.concat_ws(
        " ", F.slice(F.split(normalized_text(col), r"\s+"), 1, _PREFIX_TOKENS)
    )
_RECRAWL_MOD = 50  # corpus docs with doc_id % 50 == 7 are re-crawled today
_RECRAWL_ID_OFFSET = 1_000_000  # re-crawled docs arrive under new ids


def incremental_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup: flag each INCOMING doc against the
    already-ingested corpus — the shape a production pipeline runs every
    batch, where re-deduplicating the whole corpus is off the table.

    Two digest-equality probes, both left joins against corpus-side
    digest sets reduced to DISTINCT before the join:
    - ``exact_dup``: full normalized-text fingerprint seen in the corpus;
    - ``head_dup``: fingerprint of the first 30 normalized tokens seen —
      catches tail-edited re-crawls exact dedup misses (the cheap
      constant-width cousin of suffix dedup; MinHash cross-batch
      candidates are the recall upgrade, `split_leakage_check` shape).

    Verdict: 'drop' on either flag, else 'ingest'. The incoming batch is
    the src5 slice PLUS a simulated re-crawl (corpus docs with
    ``doc_id % 50 == 7`` arriving again under fresh ids) so both flag
    paths are exercised: re-crawls hit ``exact_dup``, src5's shared
    boilerplate heads hit ``head_dup``. Scale: the incoming batch is
    daily-sized (≪ corpus), so the BATCH digests are what gets
    broadcast — each corpus digest column is map-side semi-filtered
    against the broadcast batch set (one streaming scan, no corpus-wide
    shuffle; the only exchange is the distinct over the ≤|batch|
    matches), and the surviving corpus digests (also ≤|batch|) broadcast
    back into the verdict join. Nothing corpus-sized ever crosses the
    wire or lands on the driver; at 100 TB the corpus digests live as a
    bucketed table and the probes stay shuffle-free on the corpus side.
    """
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(normalized_text("text")).alias("fp"),
        F.md5(_head_key("text")).alias("head_fp"),
    )
    # Materialize the digests ONCE (r16, guide §2.4): `keyed` feeds the
    # corpus branch (both semi-filters), the recrawl slice, and the
    # incoming batch's three consumers — without a lineage break the
    # normalize+double-md5 text pass re-executes in each of those ~6 plan
    # branches (6 `documents` scans in the before-plan). The checkpoint
    # stores digest-width rows (id, source, 2×32-hex) — tiny next to the
    # text passes it replaces at any scale. Same-boot A/B at sf0.1:
    # 1.81 s → 1.21 s median, verdict rows identical.
    keyed = eager_checkpoint(keyed, "incremental_keyed_digests")
    corpus = keyed.where(F.col("source") != _INCOMING_SOURCE)
    recrawl = corpus.where(
        F.pmod(F.col("doc_id"), F.lit(_RECRAWL_MOD)) == 7
    ).select(
        (F.col("doc_id") + _RECRAWL_ID_OFFSET).alias("doc_id"),
        F.lit(_INCOMING_SOURCE).alias("source"),
        "fp",
        "head_fp",
    )
    incoming = keyed.where(F.col("source") == _INCOMING_SOURCE).unionByName(recrawl)
    # Semi-filter each corpus digest column against the batch digests,
    # distinct only the ≤|batch| survivors, and join those back for the
    # verdict. NO forced broadcast hints: the hint is absolute (it
    # bypasses autoBroadcastJoinThreshold and the 8 GB broadcast cap), and
    # a daily batch for a 100 TB corpus can be 10^8-10^9 digests — several
    # GB that would OOM the driver instead of falling back to a shuffled
    # semi join. At fixture scale AQE still picks broadcast on its own
    # (plan-gated), so nothing changes below the cliff; above it the plan
    # degrades gracefully to a digest-only shuffle, never a failure.
    inc_fp = incoming.select("fp").distinct()
    inc_head = incoming.select("head_fp").distinct()
    corpus_fp = (
        corpus.select("fp")
        .join(inc_fp, "fp", "semi")
        .distinct()
        .withColumn("is_exact", F.lit(True))
    )
    corpus_head = (
        corpus.select("head_fp")
        .join(inc_head, "head_fp", "semi")
        .distinct()
        .withColumn("is_head", F.lit(True))
    )
    return (
        incoming.join(corpus_fp, "fp", "left")
        .join(corpus_head, "head_fp", "left")
        .select(
            "doc_id",
            F.coalesce("is_exact", F.lit(False)).alias("exact_dup"),
            F.coalesce("is_head", F.lit(False)).alias("head_dup"),
            F.when(
                F.coalesce("is_exact", F.lit(False))
                | F.coalesce("is_head", F.lit(False)),
                "drop",
            )
            .otherwise("ingest")
            .alias("verdict"),
        )
    )


_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_HEAD_SQL = (
    f"array_to_string(list_slice(string_split_regex({_NORM_SQL}, '\\s+'), "
    f"1, {_PREFIX_TOKENS}), ' ')"
)

INCREMENTAL_DEDUP_ORACLE = f"""
WITH keyed AS (
    SELECT doc_id, source,
           md5({_NORM_SQL}) AS fp,
           md5({_HEAD_SQL}) AS head_fp
    FROM documents
), corpus AS (
    SELECT * FROM keyed WHERE source <> '{_INCOMING_SOURCE}'
), incoming AS (
    SELECT doc_id, fp, head_fp FROM keyed
    WHERE source = '{_INCOMING_SOURCE}'
    UNION ALL
    SELECT doc_id + {_RECRAWL_ID_OFFSET}, fp, head_fp FROM corpus
    WHERE doc_id % {_RECRAWL_MOD} = 7
), corpus_fp AS (
    SELECT DISTINCT fp FROM corpus
), corpus_head AS (
    SELECT DISTINCT head_fp FROM corpus
)
SELECT i.doc_id,
       (cf.fp IS NOT NULL) AS exact_dup,
       (ch.head_fp IS NOT NULL) AS head_dup,
       CASE WHEN cf.fp IS NOT NULL OR ch.head_fp IS NOT NULL
            THEN 'drop' ELSE 'ingest' END AS verdict
FROM incoming i
LEFT JOIN corpus_fp cf ON i.fp = cf.fp
LEFT JOIN corpus_head ch ON i.head_fp = ch.head_fp
"""


_QUOTA_TOTAL = 100  # eval-set size allocated across sources


def largest_remainder_quotas(counts: DataFrame, total: int) -> DataFrame:
    """Hare largest-remainder apportionment on a (source, n_s) frame:
    returns (source, quota) with sum(quota) == total exactly, every quota
    in {floor(ideal), ceil(ideal)}. All arithmetic integral (DIV) so the
    result is exact for any BIGINT-representable ``total * n_s``.
    Runs entirely on the n_sources-row frame."""
    wall = Window.partitionBy()
    wrem = Window.partitionBy().orderBy(F.col("rem").desc(), "source")
    return (
        counts.withColumn("n_total", F.sum("n_s").over(wall))
        .withColumn(
            "base",
            F.expr(f"CAST(({total} * n_s) DIV n_total AS BIGINT)"),
        )
        .withColumn("rem", total * F.col("n_s") - F.col("base") * F.col("n_total"))
        .withColumn("leftover", F.lit(total) - F.sum("base").over(wall))
        .withColumn("rrk", F.row_number().over(wrem))
        .withColumn(
            "quota",
            (
                F.col("base") + F.when(F.col("rrk") <= F.col("leftover"), 1).otherwise(0)
            ).cast("long"),
        )
        .select("source", "quota")
    )


def proportional_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional-allocation sampling with largest-remainder rounding:
    build an eval set of exactly ``_QUOTA_TOTAL`` docs whose source mix
    matches the corpus mix as closely as integer quotas allow (the Hare
    largest-remainder method apportionment uses; fixed-k-per-stratum
    sampling — `stratified_sample` — distorts the mix whenever strata
    differ in size).

    All quota arithmetic is integer-exact: with per-source counts n_s and
    corpus total N, ``M * n_s = base_s * N + rem_s`` splits each source's
    ideal share into its floor quota and a scaled remainder, the leftover
    ``M - sum(base_s)`` seats go to the largest remainders (ties on
    source name), and each source then keeps its ``quota_s`` docs with
    the lowest md5 draw. Scale: the quota computation runs on the
    n_sources-row frame (two windows over a tiny aggregate); the only
    data-sized operations are one broadcast quota join and the
    per-source selection window — the same shuffle budget as
    `stratified_sample`.
    """
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s"))
    quotas = largest_remainder_quotas(counts, _QUOTA_TOTAL)
    draw = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|quota")))
    wsel = Window.partitionBy("source").orderBy("draw", "doc_id")
    return (
        docs.select("source", "doc_id", draw.alias("draw"))
        .withColumn("rk", F.row_number().over(wsel))
        .join(F.broadcast(quotas), "source")
        .where(F.col("rk") <= F.col("quota"))
        .select("source", "doc_id", F.col("rk").cast("int").alias("rk"), "quota")
    )


PROPORTIONAL_QUOTA_ORACLE = f"""
WITH counts AS (
    SELECT source, count(*) AS n_s FROM documents GROUP BY 1
), q AS (
    SELECT source, n_s,
           sum(n_s) OVER () AS n_total,
           CAST(({_QUOTA_TOTAL} * n_s) // sum(n_s) OVER () AS BIGINT) AS base
    FROM counts
), r AS (
    SELECT source, base,
           {_QUOTA_TOTAL} * n_s - base * n_total AS rem,
           {_QUOTA_TOTAL} - sum(base) OVER () AS leftover
    FROM q
), quotas AS (
    SELECT source,
           CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                                 <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM r
), ranked AS (
    SELECT source, doc_id,
           row_number() OVER (PARTITION BY source ORDER BY
               md5(CAST(doc_id AS VARCHAR) || '|quota'), doc_id) AS rk
    FROM documents
)
SELECT ranked.source, doc_id, CAST(rk AS INT) AS rk, quota
FROM ranked JOIN quotas ON ranked.source = quotas.source
WHERE rk <= quota
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-overlap audit: for every source pair, how many head
    fingerprints (first 30 normalized tokens) they share, and the overlap
    coefficient ``shared / min(|A|, |B|)`` — the matrix a corpus owner
    reads before blending crawls (two mirrors of the same site show up as
    a high-overlap pair; the union of such pairs is double-counted mass
    the dedup pass must absorb).

    Scale: the only payload shuffled is the 128-bit digest. The self-join
    is digest-equality, so its fan-out is bounded by duplicate-group
    sizes (a digest shared by k sources yields C(k,2) pairs), and the
    output frame is at most n_sources² rows regardless of corpus size.
    Per-source distinct-head counts ride the same digest frame.
    """
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    heads = docs.select("source", F.md5(_head_key("text")).alias("head_fp")).distinct()
    sizes = heads.groupBy("source").agg(F.count("*").alias("n_heads"))
    a = heads.select(F.col("source").alias("source_a"), "head_fp")
    b = heads.select(F.col("source").alias("source_b"), "head_fp")
    pairs = (
        a.join(b, "head_fp")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_heads"))
    )
    na = F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n_heads").alias("n_a")))
    nb = F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n_heads").alias("n_b")))
    return (
        pairs.join(na, "source_a")
        .join(nb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_heads",
            F.round(F.col("shared_heads") / F.least("n_a", "n_b"), 6).alias(
                "overlap_coeff"
            ),
        )
    )


SOURCE_OVERLAP_ORACLE = f"""
WITH heads AS (
    SELECT DISTINCT source, md5({_HEAD_SQL}) AS head_fp FROM documents
), sizes AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_heads FROM heads GROUP BY 1
), pairs AS (
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared_heads
    FROM heads a JOIN heads b
      ON a.head_fp = b.head_fp AND a.source < b.source
    GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, p.shared_heads,
       round(p.shared_heads / least(sa.n_heads, sb.n_heads), 6) AS overlap_coeff
FROM pairs p
JOIN sizes sa ON sa.source = p.source_a
JOIN sizes sb ON sb.source = p.source_b
"""


def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit of `llm_ops4.sequence_packing`: per (source,
    pack), how many docs landed in the pack, its token load, and the
    padding a fixed-width trainer would burn on it — the wasted-FLOPs
    estimate run before committing to a packing configuration. A pack's
    load can exceed the budget (an over-budget doc becomes a singleton
    pack by the cum-DIV arithmetic), so padding clamps at zero and an
    ``overflow`` flag marks those packs.

    Scale: reuses the packing assignment (one per-source window), then
    one (source, pack) hash aggregation — the report frame is
    corpus_tokens / budget rows, ~10^6 per TB, trivially aggregable.
    """
    from .llm_ops4 import PACK_BUDGET, sequence_packing

    packed = sequence_packing(spark, sf_dir)
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("used_tokens"),
        )
        .select(
            "source",
            "pack_id",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("used_tokens").cast("long").alias("used_tokens"),
            F.greatest(
                F.lit(0).cast("long"), F.lit(PACK_BUDGET) - F.col("used_tokens")
            ).alias("padding_tokens"),
            (F.col("used_tokens") > PACK_BUDGET).alias("overflow"),
        )
    )


def _packing_efficiency_oracle() -> str:
    from .llm_ops4 import PACK_BUDGET, SEQUENCE_PACKING_ORACLE

    return f"""
WITH packed AS ({SEQUENCE_PACKING_ORACLE})
SELECT source, pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS used_tokens,
       greatest(0, {PACK_BUDGET} - CAST(sum(n_tok) AS BIGINT)) AS padding_tokens,
       (CAST(sum(n_tok) AS BIGINT) > {PACK_BUDGET}) AS overflow
FROM packed
GROUP BY 1, 2
"""


PACKING_EFFICIENCY_ORACLE = _packing_efficiency_oracle()


def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation confusion matrix for the language-ID
    heuristic against the fixture's ground-truth ``lang`` labels — the
    audit a pipeline runs before trusting a filter model's decisions
    downstream (per true-class recall exposes WHICH languages a
    stopword-voting en/und detector will silently misroute).

    One broadcast join of predictions to labels + one hash aggregation;
    the matrix frame is |langs| x |predictions| regardless of corpus
    size, and per-true-class shares are window sums over that tiny
    frame."""
    from .llm_ops import language_id_heuristic

    preds = language_id_heuristic(spark, sf_dir).select(
        "doc_id", "predicted_lang"
    )
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    cells = (
        docs.join(preds, "doc_id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
    )
    wtrue = Window.partitionBy("true_lang")
    return cells.select(
        "true_lang",
        "predicted_lang",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wtrue), 6).alias("share_of_true"),
    )


def _langid_confusion_oracle() -> str:
    from .llm_ops import LANGUAGE_ID_ORACLE

    return f"""
WITH preds AS ({LANGUAGE_ID_ORACLE}),
cells AS (
    SELECT d.lang AS true_lang, p.predicted_lang, CAST(count(*) AS BIGINT) AS n
    FROM documents d JOIN preds p ON d.doc_id = p.doc_id
    GROUP BY 1, 2
)
SELECT true_lang, predicted_lang, n,
       round(n / sum(n) OVER (PARTITION BY true_lang), 6) AS share_of_true
FROM cells
"""


LANGID_CONFUSION_ORACLE = _langid_confusion_oracle()


_PRECISION_THRESHOLD = 0.5  # the dedup pass's true-positive bar


def minhash_candidate_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality audit of the MinHash-LSH band index: every candidate
    pair the bands surface (NO verify threshold), bucketed by its exact
    Jaccard decile, with each bucket's share of the candidate stream and
    whether it clears the dedup pass's 0.5 bar. The per-decile precision
    profile is what an index owner reads to retune bands/rows — a fat
    low-decile tail means the bands are wasting verification compute, an
    empty high tail means recall risk (tests pin recall separately).

    Scale: identical plan to minhash_lsh_dedup (the threshold filter is
    the only difference) plus one decile aggregation over the candidate
    stream — the profile frame is at most 11 rows."""
    from ..operators.dedup import minhash_lsh_candidates

    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(
        docs, "text", "doc_id", verify_threshold=0.0
    )
    wall = Window.partitionBy()
    return (
        cands.withColumn(
            "jaccard_decile",
            F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("int"),
        )
        .groupBy("jaccard_decile")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "jaccard_decile",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(F.col("n_pairs") / F.sum("n_pairs").over(wall), 6).alias(
                "share"
            ),
            (F.col("jaccard_decile") >= int(_PRECISION_THRESHOLD * 10)).alias(
                "passes_verify"
            ),
        )
    )


def _minhash_precision_oracle() -> str:
    from .llm_ops import _minhash_oracle

    return f"""
WITH cands AS ({_minhash_oracle(verify_threshold=0.0)}),
buckets AS (
    SELECT CAST(least(floor(jaccard * 10), 9) AS INT) AS jaccard_decile,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM cands GROUP BY 1
)
SELECT jaccard_decile, n_pairs,
       round(n_pairs / sum(n_pairs) OVER (), 6) AS share,
       (jaccard_decile >= {int(_PRECISION_THRESHOLD * 10)}) AS passes_verify
FROM buckets
"""


MINHASH_PRECISION_ORACLE = _minhash_precision_oracle()


REGISTRY: list[tuple] = [
    ("training_shard_export", training_shard_export, TRAINING_SHARD_ORACLE),
    ("token_budget_mix", token_budget_mix, TOKEN_BUDGET_ORACLE),
    ("mmr_diverse_topk", mmr_diverse_topk, MMR_ORACLE),
    ("kmeans_label_purity", kmeans_label_purity, KMEANS_PURITY_ORACLE),
    ("incremental_corpus_dedup", incremental_corpus_dedup, INCREMENTAL_DEDUP_ORACLE),
    (
        "proportional_quota_sample",
        proportional_quota_sample,
        PROPORTIONAL_QUOTA_ORACLE,
    ),
    ("source_overlap_matrix", source_overlap_matrix, SOURCE_OVERLAP_ORACLE),
    (
        "packing_efficiency_report",
        packing_efficiency_report,
        PACKING_EFFICIENCY_ORACLE,
    ),
    ("langid_confusion_matrix", langid_confusion_matrix, LANGID_CONFUSION_ORACLE),
    (
        "minhash_candidate_precision",
        minhash_candidate_precision,
        MINHASH_PRECISION_ORACLE,
    ),
]
