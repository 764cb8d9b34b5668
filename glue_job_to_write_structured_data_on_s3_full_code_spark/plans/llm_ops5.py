"""LLM training-data pipeline pack 5 — embedding-space curation and
tokenizer induction: integer-exact Lloyd k-means, SemDeDup-style semantic
deduplication, model-based quality scoring (hashed linear classifier), BPE
merge-rule induction over the corpus vocabulary, and the per-source
dataset-card report.

Design rules (same as llm_ops/llm_ops2/llm_ops3):
- pure ``pyspark.sql.functions`` expressions — no Python boundary;
- every query carries a DuckDB oracle. Embedding math is made
  cross-engine-exact the same way `embedding_lsh_topk` was tamed: quantize
  each float to ``floor(x * 1000)`` (a BIGINT), then do ALL distance /
  dot-product / centroid arithmetic in integer space. Sums of 64-dim
  products of |q| <= 1000 values stay far inside int64, so both engines
  compute bit-identical results; cosine thresholds compare as integer
  cross-products (``400*dot^2 >= 289*n1*n2`` <=> cos >= 0.85), never as
  floats.
- deterministic at any parallelism: argmin ties break on centroid id,
  merge-rule ties on the pair string, sampling reuses md5 buckets.

Scale notes (100 TB):
- k-means is the classic K-fanout: each point scores against the K
  broadcast centroids (K*N intermediate rows, one window per point) and
  the centroid update is one (cid, dim) hash aggregation — no driver
  collect anywhere; at production K (10^4-10^5, SemDeDup's regime) the
  scoring join switches to the IVF-style coarse-then-refine shape already
  in operators/similarity.py.
- semantic dedup's pairwise stage runs ONLY within a cluster — the whole
  point of SemDeDup (Abbas et al. 2023, arXiv:2303.09540): O(sum c_i^2)
  with bounded cluster sizes instead of O(N^2).
- BPE induction aggregates the corpus down to its VOCABULARY first
  (bounded, ~10^5-10^6 rows at any corpus size); every merge step is one
  map-side-combined pair count + a 1-row broadcast back. This is how
  distributed tokenizer training actually shapes (map corpus -> word
  histogram once; iterate on the histogram).
- the dataset card is two hash aggregations and a broadcast join — the
  report every released corpus ships (cf. Datasheets for Datasets).

Reference parity: the reference has no embedding/tokenizer surface (it is
a CRM ETL job, FULL.py); this pack is north-star extension material on the
synthetic `embeddings` / `documents` tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text, tokens
from ..session import tune
from ..sources import read_table

_Q = 1000  # quantization scale: floor(x * 1000) — exact in both engines
_K = 8  # cluster count for the demo-scale corpus (parameter at scale)

# DuckDB spellings shared with llm_ops3.
_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS = f"string_split_regex({_NORM}, '\\s+')"

_QV_SQL = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
)


def _qvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings quantized to integer space: qv[i] = floor(v[i]*1000)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"), lambda x: F.floor(x.cast("double") * _Q).cast("long")
        ).alias("qv"),
    )


def _init_centroids(vecs: DataFrame, k: int = _K) -> DataFrame:
    """Deterministic seeds: the K lowest-id vectors (same policy as the
    IVF/PQ quantizers in operators/similarity.py — no RNG, no driver
    state, replayable in SQL)."""
    return vecs.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cvec")
    )


def _assign(vecs: DataFrame, cents: DataFrame, keep: int = 1) -> DataFrame:
    """Min squared-L2 assignment (``keep`` best cells — 1 for clustering,
    nprobe for IVF probing). The centroid table is broadcast (K rows);
    dist is an integer fold over zip_with, ties break on cid."""
    dist = F.aggregate(
        F.zip_with("qv", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn("dist", dist)
    if keep == 1:
        # argmin, not top-n: a min_by hash aggregate map-side-combines
        # each vector's K scored candidates to one row BEFORE the
        # exchange, where the row_number window would shuffle all N·K
        # rows to sort them per vec_id (same cut as the IVF assignment in
        # operators/similarity._ivf_assign). The integer (dist, cid) key
        # reproduces the window's ordering exactly — no float ties to
        # worry about. Output columns/order are identical to the window
        # path: every input column plus cid and dist, minus cvec.
        out_cols = [c for c in scored.columns if c != "cvec"]
        payload = [c for c in out_cols if c != "vec_id"]
        return (
            scored.groupBy("vec_id")
            .agg(
                F.min_by(
                    F.struct(*payload),
                    F.struct(F.col("dist"), F.col("cid")),
                ).alias("_best")
            )
            .select(
                *[
                    F.col(c) if c == "vec_id" else F.col(f"_best.{c}").alias(c)
                    for c in out_cols
                ]
            )
        )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= keep)
        .drop("cvec", "rk")  # keep every input column (callers may carry norms)
    )


def _recompute_centroids(assigned: DataFrame) -> DataFrame:
    """Element-wise integer mean: floor-division implemented as
    (s - pmod(s, n)) / n so negative sums floor identically in both
    engines (Spark's and DuckDB's `%` both truncate toward zero, so the
    raw remainder differs on negatives — pmod does not)."""
    longf = assigned.select("cid", F.posexplode("qv").alias("pos", "val"))
    sums = longf.groupBy("cid", "pos").agg(
        F.sum("val").alias("s"), F.count("*").alias("n")
    )
    cvals = sums.withColumn(
        "cval", ((F.col("s") - F.pmod("s", "n")) / F.col("n")).cast("long")
    )
    return cvals.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))), lambda s: s["cval"]
        ).alias("cvec")
    )


def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k=8) in quantized integer space —
    the curation-clustering primitive SemDeDup / SSL-prototypes pipelines
    run before per-cluster dedup or sampling. Deterministic seeds, exact
    integer distances, floor-div centroid updates: every step replays
    bit-identically in the DuckDB oracle (the same taming that made
    PQ/IVFADC oracle-able). Returns the final assignment."""
    tune(spark)
    vecs = _qvecs(spark, sf_dir)
    a1 = _assign(vecs, _init_centroids(vecs))
    a2 = _assign(vecs, _recompute_centroids(a1))
    return a2.select(
        "vec_id", F.col("cid").alias("cluster"), F.col("dist").alias("sq_dist")
    )


EMBEDDING_KMEANS_ORACLE = f"""
WITH qv AS (
    SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
), v AS (
    SELECT vec_id, generate_subscripts(qv, 1) AS pos, unnest(qv) AS val FROM qv
), c0 AS (
    SELECT vec_id AS cid, pos, val AS cval FROM v WHERE vec_id < {_K}
), d1 AS (
    SELECT v.vec_id, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS dist
    FROM v JOIN c0 c USING (pos) GROUP BY 1, 2
), a1 AS (
    SELECT vec_id, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d1) WHERE rk = 1
), m1 AS (
    SELECT a1.cid, v.pos,
           CAST((sum(v.val) - ((sum(v.val) % count(*) + count(*)) % count(*)))
                / count(*) AS BIGINT) AS cval
    FROM a1 JOIN v USING (vec_id) GROUP BY 1, 2
), d2 AS (
    SELECT v.vec_id, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS dist
    FROM v JOIN m1 c USING (pos) GROUP BY 1, 2
)
SELECT vec_id, cid AS cluster, CAST(dist AS BIGINT) AS sq_dist FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d2) WHERE rk = 1
"""


#: Fraction of each cluster kept by the prototype selector — a parameter
#: at scale (SSL-prototypes sweeps it per budget); fixed for the oracle.
_PROTO_KEEP_FRAC = 0.25


def cluster_prototype_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based data pruning (SSL-prototypes, Sorscher et al. 2022,
    arXiv:2206.14486 — the selection step SemDeDup pipelines run after
    clustering): k-means the embedding space, rank each cluster's members
    by distance to their centroid, and keep the most PROTOTYPICAL
    ``_PROTO_KEEP_FRAC`` of every cluster (per-cluster ceil quota, so no
    cluster is emptied). Prototype-keep is the easy-data regime; the same
    ranking inverted gives the hard-example regime — the returned
    ``rank_in_cluster``/``cluster_size`` columns support either cut
    downstream.

    Reuses :func:`embedding_kmeans`'s two integer-exact Lloyd iterations
    (same seeds, same floor-div centroid update), so distances and ranks
    replay bit-identically in the DuckDB oracle — no float boundary
    anywhere. Scale shape: the ranking is ONE window partitioned by
    cluster over the assignment frame; per-task input is one cluster,
    which the SemDeDup/K-scales-with-N contract bounds, and the quota
    needs no second pass (count(*) rides the same window partition).

    Reference parity: north-star extension (the reference has no
    embedding surface); registered on the synthetic `embeddings` table.
    """
    tune(spark)
    vecs = _qvecs(spark, sf_dir)
    a1 = _assign(vecs, _init_centroids(vecs))
    a2 = _assign(vecs, _recompute_centroids(a1))
    assigned = a2.select(
        "vec_id", F.col("cid").alias("cluster"), F.col("dist").alias("sq_dist")
    )
    wrk = Window.partitionBy("cluster").orderBy("sq_dist", "vec_id")
    wn = Window.partitionBy("cluster")
    return (
        assigned.withColumn(
            "rank_in_cluster", F.row_number().over(wrk).cast("long")
        )
        .withColumn("cluster_size", F.count(F.lit(1)).over(wn))
        .where(
            F.col("rank_in_cluster")
            <= F.ceil(F.col("cluster_size") * F.lit(_PROTO_KEEP_FRAC))
        )
        .select(
            "vec_id", "cluster", "sq_dist", "rank_in_cluster", "cluster_size"
        )
    )


CLUSTER_PROTOTYPE_ORACLE = f"""
WITH qv AS (
    SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
), v AS (
    SELECT vec_id, generate_subscripts(qv, 1) AS pos, unnest(qv) AS val FROM qv
), c0 AS (
    SELECT vec_id AS cid, pos, val AS cval FROM v WHERE vec_id < {_K}
), d1 AS (
    SELECT v.vec_id, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS dist
    FROM v JOIN c0 c USING (pos) GROUP BY 1, 2
), a1 AS (
    SELECT vec_id, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d1) WHERE rk = 1
), m1 AS (
    SELECT a1.cid, v.pos,
           CAST((sum(v.val) - ((sum(v.val) % count(*) + count(*)) % count(*)))
                / count(*) AS BIGINT) AS cval
    FROM a1 JOIN v USING (vec_id) GROUP BY 1, 2
), d2 AS (
    SELECT v.vec_id, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS dist
    FROM v JOIN m1 c USING (pos) GROUP BY 1, 2
), a2 AS (
    SELECT vec_id, cid AS cluster, CAST(dist AS BIGINT) AS sq_dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d2) WHERE rk = 1
), ranked AS (
    SELECT vec_id, cluster, sq_dist,
           CAST(row_number() OVER (
               PARTITION BY cluster ORDER BY sq_dist, vec_id
           ) AS BIGINT) AS rank_in_cluster,
           CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size
    FROM a2
)
SELECT * FROM ranked
WHERE rank_in_cluster <= CAST(ceil(cluster_size * {_PROTO_KEEP_FRAC}) AS BIGINT)
"""


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    drop near-duplicates WITHIN each cluster only — the sub-quadratic
    semantic twin of MinHash dedup. A row is dropped when a lower-id
    vector in its cluster has cosine >= 0.85; the threshold compares as
    the integer cross-product 400*dot^2 >= 289*n1*n2 (17/20 = 0.85) with
    a dot > 0 guard, so both engines decide every pair identically.

    Physical shape: ONE shuffle (the cluster-key groupBy) and zero joins —
    each cluster scores its own pair triangle in a single Arrow
    ``applyInPandas`` integer matmul (the blocked-near-dup pattern from
    operators/similarity.py, keyed by cluster instead of id-block). All
    arithmetic stays EXACT: int64 when the per-cluster magnitude bound
    proves ``400*dot^2`` cannot wrap, arbitrary-precision Python ints
    otherwise — so the decision matches the DuckDB oracle's HUGEINT
    compare pair-for-pair. Per-task memory is one cluster of vectors,
    which the SemDeDup contract bounds (K scales with N). Measured ~2×
    over the previous expression self-join at sf0.1 (interpreted
    zip_with dots over 250k pairs were the cost)."""
    tune(spark)
    import numpy as np
    import pandas as pd

    vecs = _qvecs(spark, sf_dir)
    a = _assign(vecs, _init_centroids(vecs)).select("vec_id", "cid", "qv")

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.array(pdf["qv"].tolist(), dtype=np.int64)[order]
        # int64 is exact while 400*(dim*maxq^2)^2 < 2^63; beyond that
        # (|x| ≳ 8.6 pre-quantization at dim 64) fall back to Python-int
        # object arithmetic — exact at any magnitude, like the oracle's
        # HUGEINT promotion
        max_dot = mat.shape[1] * int(np.abs(mat).max(initial=0)) ** 2
        if 400 * max_dot * max_dot >= 2**63:
            mat = mat.astype(object)
        nrm = (mat * mat).sum(axis=1)
        dot = mat @ mat.T
        ok = (dot > 0) & (400 * dot * dot >= 289 * np.outer(nrm, nrm))
        dropped = np.triu(ok, k=1).any(axis=0)  # a smaller-id near-dup exists
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cid"].iloc[0],
                "kept": ~dropped,
            }
        )

    return a.groupBy("cid").applyInPandas(
        score, "vec_id long, cluster long, kept boolean"
    )


SEMANTIC_DEDUP_ORACLE = f"""
WITH qv AS (
    SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
), v AS (
    SELECT vec_id, generate_subscripts(qv, 1) AS pos, unnest(qv) AS val FROM qv
), c0 AS (
    SELECT vec_id AS cid, pos, val AS cval FROM v WHERE vec_id < {_K}
), d1 AS (
    SELECT v.vec_id, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS dist
    FROM v JOIN c0 c USING (pos) GROUP BY 1, 2
), a1 AS (
    SELECT vec_id, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d1) WHERE rk = 1
), ann AS (
    SELECT a1.vec_id, a1.cid, qv.qv,
           (SELECT sum(x.a * x.a) FROM (SELECT unnest(qv.qv) AS a) x) AS nrm
    FROM a1 JOIN qv USING (vec_id)
), dropped AS (
    SELECT DISTINCT r.vec_id
    FROM ann l JOIN ann r ON l.cid = r.cid AND l.vec_id < r.vec_id
    WHERE (SELECT sum(x.a * x.b)
           FROM (SELECT unnest(l.qv) AS a, unnest(r.qv) AS b) x) > 0
      AND 400 * (SELECT sum(x.a * x.b)
                 FROM (SELECT unnest(l.qv) AS a, unnest(r.qv) AS b) x)
              * (SELECT sum(x.a * x.b)
                 FROM (SELECT unnest(l.qv) AS a, unnest(r.qv) AS b) x)
          >= 289 * l.nrm * r.nrm
)
SELECT a.vec_id, a.cid AS cluster, (d.vec_id IS NULL) AS kept
FROM ann a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


def quality_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring with a hashed-feature linear classifier
    — the fasttext-style quality filter of CCNet / GPT-3-era pipelines,
    with a deterministic stand-in model: each token's weight is
    md5-derived in [-1000, 1000], a document's score is the sum over its
    token stream (bag of words), accept = score >= 0. Integer weights keep
    the sum exact in both engines; swapping in real learned weights is a
    broadcast-join against a weight table with the same plan shape.

    Map-side tokenize -> one hash aggregation; the weight is computed
    inline (no vocabulary join needed for a hashed model — that IS the
    hashing trick)."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    tok = (
        docs.where(normalized_text("text") != "")
        .select("doc_id", F.explode(tokens(normalized_text("text"))).alias("tok"))
    )
    w = (
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long") % 2001 - 1000
    )
    return (
        tok.withColumn("w", w)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("w").alias("score"),
        )
        .withColumn("accept", F.col("score") >= 0)
    )


QUALITY_CLASSIFIER_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, unnest({_TOKS}) AS tok
    FROM documents WHERE {_NORM} <> ''
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CAST(('0x' || substring(md5(tok), 1, 15))::UBIGINT % 2001 AS BIGINT)
                - 1000) AS BIGINT) AS score,
       CAST(sum(CAST(('0x' || substring(md5(tok), 1, 15))::UBIGINT % 2001 AS BIGINT)
                - 1000) AS BIGINT) >= 0 AS accept
FROM tok GROUP BY doc_id
"""

def duplicated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-span profile — the substring-level dedup
    signal (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): for every document, the share of its distinct
    5-grams that appear in at least one OTHER document. Complements
    `sentence_dedup` (exact sentence granularity) and
    `repetition_ratio_filter` (within-doc): this is the cross-document
    span-duplication rate that drives substring-trimming decisions.

    Every shuffle carries 32-hex md5 digests, never gram text. The corpus
    frequency is a ``count(*) over (partition by gh)`` window on the ONE
    distinct gram table instead of a groupBy + join back: the join
    formulation generated the grams TWICE (two full scan→tokenize→explode
    chains, one per join input) and shuffled the gram table twice more for
    the frequency join — the window gets the same per-row count from a
    single gram generation and a single digest exchange (guide §2.4: two
    operations keyed the same way share one exchange). r15: 2 scans /
    2 Generates / 4 Exchanges + a corpus-sized broadcast → 1 scan /
    1 Generate / 3 Exchanges, no broadcast (at 100 TB the frequency side
    would not fit a broadcast and the join would add two sort-merge
    exchanges instead).

    Gram generation uses llm_ops3.five_gram_digests (index-explode — the
    lambda-inlining hazard documented there and in SCALE.md's tuning log
    measured 77 s vs 2 s at sf0.1 for this query)."""
    tune(spark)
    from pyspark.sql import Window

    from .llm_ops3 import five_gram_digests

    docs = read_table(spark, sf_dir, "documents")
    grams = five_gram_digests(docs.select("doc_id", "text"), "doc_id")
    nd = F.count("*").over(Window.partitionBy("gh"))
    return (
        grams.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup_grams"),
        )
        .withColumn(
            "dup_fraction", F.round(F.col("n_dup_grams") / F.col("n_grams"), 6)
        )
    )


DUP_NGRAM_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, {_TOKS} AS ts FROM documents WHERE {_NORM} <> ''
), grams AS (
    SELECT DISTINCT doc_id, md5(g) AS gh FROM (
        SELECT doc_id, unnest(CASE WHEN len(ts) >= 5
            THEN list_transform(range(1, len(ts) - 3),
                 i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3], ts[i+4]))
            ELSE [array_to_string(ts, ' ')] END) AS g
        FROM toks)
), freq AS (
    SELECT gh, count(*) AS nd FROM grams GROUP BY gh
)
SELECT g.doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
       round(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) / count(*), 6) AS dup_fraction
FROM grams g JOIN freq f USING (gh)
GROUP BY g.doc_id
"""

_VOCAB_CAP = 500  # merge statistics run over the top-|V| word histogram
_BPE_STEPS = 3


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies over the (word, freq, syms) table.
    Symbols travel as a '|'-delimited string ('|h|e|l|l|o|') so merge
    application is a plain string replace in both engines."""
    arr = F.filter(F.split("s", r"\|"), lambda x: x != "")
    n = F.size(arr)
    zipped = F.arrays_zip(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
    )
    return (
        syms.select("freq", F.explode(zipped).alias("p"))
        .select("freq", F.col("p")["0"].alias("l"), F.col("p")["1"].alias("r"))
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("pair_count"))
    )


def _sym_string(word_col: str) -> F.Column:
    """'hello' → '|h|e|l|l|o|' — the delimited symbol representation that
    makes merge application a plain string replace in both engines."""
    return F.concat(
        F.lit("|"),
        F.array_join(F.regexp_extract_all(F.col(word_col), F.lit("."), 0), "|"),
        F.lit("|"),
    )


def _apply_merge(syms: DataFrame, top: DataFrame) -> DataFrame:
    """Apply a 1-row merge table (broadcast) to the delimited symbols."""
    return (
        syms.crossJoin(F.broadcast(top.select("left_sym", "right_sym", "merged")))
        .withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.concat(F.lit("|"), "left_sym", F.lit("|"), "right_sym", F.lit("|")),
                F.concat(F.lit("|"), "merged", F.lit("|")),
            ),
        )
        .drop("left_sym", "right_sym", "merged")
    )


def _bpe_learn(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """Learn the first _BPE_STEPS merge rules from the capped word
    histogram; returns one 1-row DataFrame per step."""
    docs = read_table(spark, sf_dir, "documents")
    words = (
        docs.where(normalized_text("text") != "")
        .select(F.explode(tokens(normalized_text("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "w")
        .limit(_VOCAB_CAP)
    )
    syms = words.select("w", "freq", _sym_string("w").alias("s"))
    merges = []
    for step in range(1, _BPE_STEPS + 1):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("pair_count").desc(), "l", "r")
            .limit(1)
            .select(
                F.lit(step).alias("step"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.concat("l", "r").alias("merged"),
                "pair_count",
            )
        )
        merges.append(top)
        syms = _apply_merge(syms, top)
    return merges


def bpe_merge_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training, first 3 merge rules: aggregate
    the corpus to its word histogram ONCE (the only corpus-sized pass —
    how tokenizer training shapes at 100 TB), cap at the top-500 words,
    then iterate pair-count -> argmax -> merge on the bounded histogram.
    Each merge is a 1-row broadcast; application is a left-to-right
    non-overlapping replace of '|l|r|' with '|lr|' — deterministic and
    identical in Spark and DuckDB (back-to-back overlapping chains merge
    every other occurrence in BOTH engines, so the oracle replays it
    exactly; textbook greedy BPE differs only on such chains). Ties break
    on (count desc, l, r). Returns the learned merge table."""
    tune(spark)
    merges = _bpe_learn(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _bpe_oracle_ctes() -> str:
    """The merge-learning CTE chain (words → s1 → t1..t3) shared by the
    induction and the corpus-encode oracles."""
    base = f"""
WITH words AS (
    SELECT tok AS w, count(*) AS freq
    FROM (SELECT unnest({_TOKS}) AS tok FROM documents WHERE {_NORM} <> '')
    GROUP BY 1 ORDER BY freq DESC, w LIMIT {_VOCAB_CAP}
), s1 AS (
    SELECT w, freq,
           '|' || array_to_string(regexp_extract_all(w, '.'), '|') || '|' AS s
    FROM words
)"""
    parts = []
    for step in range(1, _BPE_STEPS + 1):
        parts.append(
            f""", p{step} AS (
    SELECT arr[i] AS l, arr[i + 1] AS r, sum(freq) AS pair_count
    FROM (SELECT freq, list_filter(string_split(s, '|'), x -> x <> '') AS arr
          FROM s{step}),
         unnest(range(1, len(arr))) AS t(i)
    GROUP BY 1, 2
), t{step} AS (
    SELECT {step} AS step, l AS left_sym, r AS right_sym, l || r AS merged,
           CAST(pair_count AS BIGINT) AS pair_count
    FROM p{step} ORDER BY pair_count DESC, l, r LIMIT 1
), s{step + 1} AS (
    SELECT w, freq,
           replace(s, '|' || t.left_sym || '|' || t.right_sym || '|',
                   '|' || t.merged || '|') AS s
    FROM s{step}, t{step} t
)"""
        )
    return base + "".join(parts)


def _bpe_oracle() -> str:
    union = " UNION ALL ".join(
        f"SELECT * FROM t{step}" for step in range(1, _BPE_STEPS + 1)
    )
    return _bpe_oracle_ctes() + "\n" + union


BPE_MERGE_ORACLE = _bpe_oracle()


def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer loop CLOSED: learn the merge rules (bounded-vocab
    iteration, see bpe_merge_induction), then ENCODE the whole corpus
    with them — per document, the token/char/BPE-symbol counts that a
    token-budget packer or cost model consumes.

    Encoding applies the merges to the DISTINCT word set (dedupe-before-
    kernel again: |V| rows through the replace chain, not N·doc_len) and
    joins the per-word symbol counts back to the token stream — one
    distinct + one join + one doc aggregation beyond the learning pass."""
    tune(spark)
    merges = _bpe_learn(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.where(normalized_text("text") != "").select(
        "doc_id", F.explode(tokens(normalized_text("text"))).alias("w")
    )
    words_all = tok.select("w").distinct().withColumn("s", _sym_string("w"))
    for top in merges:
        words_all = _apply_merge(words_all, top)
    word_stats = words_all.select(
        "w",
        F.size(F.filter(F.split("s", r"\|"), lambda x: x != "")).alias("n_syms"),
        F.length("w").alias("n_chars"),
    )
    return (
        tok.join(word_stats, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_syms").alias("n_bpe_symbols"),
        )
    )


def _bpe_encode_oracle() -> str:
    enc = [
        """, aw AS (
    SELECT DISTINCT tok AS w
    FROM (SELECT unnest(TOKS_PLACEHOLDER) AS tok FROM documents WHERE NORM_PLACEHOLDER <> '')
), e1 AS (
    SELECT w, '|' || array_to_string(regexp_extract_all(w, '.'), '|') || '|' AS s
    FROM aw
)"""
    ]
    for step in range(1, _BPE_STEPS + 1):
        enc.append(
            f""", e{step + 1} AS (
    SELECT w, replace(s, '|' || t.left_sym || '|' || t.right_sym || '|',
                      '|' || t.merged || '|') AS s
    FROM e{step}, t{step} t
)"""
        )
    tail = f""", ws AS (
    SELECT w, len(list_filter(string_split(s, '|'), x -> x <> '')) AS n_syms,
           length(w) AS n_chars
    FROM e{_BPE_STEPS + 1}
)
SELECT d.doc_id, count(*) AS n_tokens,
       CAST(sum(ws.n_chars) AS BIGINT) AS n_chars,
       CAST(sum(ws.n_syms) AS BIGINT) AS n_bpe_symbols
FROM (SELECT doc_id, unnest(TOKS_PLACEHOLDER) AS w
      FROM documents WHERE NORM_PLACEHOLDER <> '') d
JOIN ws USING (w)
GROUP BY d.doc_id"""
    sql = _bpe_oracle_ctes() + "".join(enc) + tail
    return sql.replace("TOKS_PLACEHOLDER", _TOKS).replace("NORM_PLACEHOLDER", _NORM)


BPE_ENCODE_ORACLE = _bpe_encode_oracle()


def contrastive_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pair mining for embedding-model finetuning: positives are
    MinHash near-duplicate pairs (the md5 Carter-Wegman family — the
    whole candidate pipeline replays in the oracle), negatives are
    deterministic pseudo-random pairings (consecutive docs in md5 order
    WITHIN a hash bucket — a partitioned window, never a global sort),
    minus any pair that is also a positive. The (anchor, other, label)
    table a contrastive dataloader consumes.

    Scale: positives are the sub-quadratic LSH band join; negatives cost
    one bucketed window over doc ids; the label anti-join runs on id
    pairs only."""
    from ..operators.dedup import minhash_lsh_candidates

    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    pos = (
        minhash_lsh_candidates(docs, "text", "doc_id")
        .select("doc_a", "doc_b")
        .withColumn("label", F.lit(1))
    )
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("bkt").orderBy("h", "doc_id")
    ordered = docs.select(
        "doc_id", h.alias("h"), F.substring(h, 1, 1).alias("bkt")
    )
    neg_raw = (
        ordered.withColumn("nxt", F.lead("doc_id").over(w))
        .where(F.col("nxt").isNotNull())
        .select(
            F.least("doc_id", "nxt").alias("doc_a"),
            F.greatest("doc_id", "nxt").alias("doc_b"),
        )
    )
    neg = neg_raw.join(pos, ["doc_a", "doc_b"], "left_anti").withColumn(
        "label", F.lit(0)
    )
    return pos.unionByName(neg)


def _contrastive_oracle() -> str:
    from .llm_ops import _minhash_oracle

    return f"""
WITH pos AS (
    SELECT doc_a, doc_b FROM ({_minhash_oracle()})
), ordered AS (
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bkt
    FROM documents
), ranked AS (
    SELECT doc_id, bkt,
           row_number() OVER (PARTITION BY bkt ORDER BY h, doc_id) AS rk
    FROM ordered
), neg AS (
    SELECT least(a.doc_id, b.doc_id) AS doc_a,
           greatest(a.doc_id, b.doc_id) AS doc_b
    FROM ranked a JOIN ranked b ON a.bkt = b.bkt AND b.rk = a.rk + 1
)
SELECT doc_a, doc_b, 1 AS label FROM pos
UNION ALL
SELECT n.doc_a, n.doc_b, 0 AS label
FROM neg n LEFT JOIN pos p ON p.doc_a = n.doc_a AND p.doc_b = n.doc_b
WHERE p.doc_a IS NULL
"""


_SYS_PREFIX = "<|system|>You are a helpful assistant.<|user|>"
_ASSIST_TAG = "<|assistant|>"
_END_TAG = "<|end|>"
_RESP_BUDGET = 200


def chat_template_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT data prep: format each document into a chat template (system /
    user / assistant) with a response-side truncation budget and emit the
    LOSS-MASK character offsets of the assistant span — the assembly step
    between a curated corpus and a fine-tuning dataloader. Map-only;
    every output is an integer offset or a digest, so the oracle is
    exact. Swapping the halves-split for real (prompt, response) columns
    keeps the same plan."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    cut = F.floor(F.col("n_chars") / 2).cast("int")
    prompt = F.expr("substring(text, 1, cast(floor(n_chars / 2) as int))")
    resp = F.expr(
        "substring(text, cast(floor(n_chars / 2) as int) + 1, "
        f"{_RESP_BUDGET})"
    )
    template = F.concat(
        F.lit(_SYS_PREFIX), prompt, F.lit(_ASSIST_TAG), resp, F.lit(_END_TAG)
    )
    resp_start = (
        F.lit(len(_SYS_PREFIX)) + cut + F.lit(len(_ASSIST_TAG)) + F.lit(1)
    )
    return docs.select(
        "doc_id",
        F.length(template).alias("template_len"),
        resp_start.cast("long").alias("resp_start"),
        (resp_start + F.length(resp) - 1).cast("long").alias("resp_end"),
        ((F.col("n_chars") - cut) > _RESP_BUDGET).alias("truncated"),
        F.md5(template).alias("template_digest"),
    )


CHAT_TEMPLATE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, n_chars,
           CAST(floor(n_chars / 2) AS INT) AS cut,
           substring(text, 1, CAST(floor(n_chars / 2) AS INT)) AS prompt,
           substring(text, CAST(floor(n_chars / 2) AS INT) + 1, {_RESP_BUDGET}) AS resp
    FROM documents
)
SELECT doc_id,
       CAST(length('{_SYS_PREFIX}' || prompt || '{_ASSIST_TAG}' || resp || '{_END_TAG}')
            AS BIGINT) AS template_len,
       CAST({len(_SYS_PREFIX)} + cut + {len(_ASSIST_TAG)} + 1 AS BIGINT) AS resp_start,
       CAST({len(_SYS_PREFIX)} + cut + {len(_ASSIST_TAG)} + length(resp) AS BIGINT) AS resp_end,
       (n_chars - cut) > {_RESP_BUDGET} AS truncated,
       md5('{_SYS_PREFIX}' || prompt || '{_ASSIST_TAG}' || resp || '{_END_TAG}')
           AS template_digest
FROM t
"""


def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: the release-report aggregate every corpus
    ships (docs, token volume, exact-dup rate, language spread, dominant
    language). Two hash aggregations plus a broadcast join of the
    source-level top-language row — integer/string outputs only, exact in
    both engines. mean_tokens is an integer floor-division."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.size(tokens(normalized_text("text"))).alias("n_toks"),
        F.md5(normalized_text("text")).alias("fp"),
    )
    base = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.countDistinct("fp").alias("distinct_docs"),
        F.countDistinct("lang").alias("n_langs"),
    )
    lang_w = Window.partitionBy("source").orderBy(
        F.col("lang_docs").desc(), "lang"
    )
    top_lang = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("lang_docs"))
        .withColumn("rk", F.row_number().over(lang_w))
        .where(F.col("rk") == 1)
        .select("source", F.col("lang").alias("top_lang"),
                F.col("lang_docs").alias("top_lang_docs"))
    )
    return (
        base.join(F.broadcast(top_lang), "source")
        .withColumn("dup_docs", F.col("n_docs") - F.col("distinct_docs"))
        .withColumn(
            "mean_tokens",
            ((F.col("total_tokens") - F.pmod("total_tokens", "n_docs"))
             / F.col("n_docs")).cast("long"),
        )
        .select(
            "source", "n_docs", "total_tokens", "distinct_docs", "dup_docs",
            "n_langs", "mean_tokens", "top_lang", "top_lang_docs",
        )
    )


DATASET_CARD_ORACLE = f"""
WITH d AS (
    SELECT doc_id, source, lang,
           CASE WHEN {_NORM} = '' THEN 0 ELSE len({_TOKS}) END AS n_toks,
           md5({_NORM}) AS fp
    FROM documents
), base AS (
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           count(DISTINCT fp) AS distinct_docs,
           count(DISTINCT lang) AS n_langs
    FROM d GROUP BY source
), tl AS (
    SELECT source, lang AS top_lang, lang_docs AS top_lang_docs FROM (
        SELECT source, lang, count(*) AS lang_docs,
               row_number() OVER (PARTITION BY source
                                  ORDER BY count(*) DESC, lang) AS rk
        FROM d GROUP BY source, lang) WHERE rk = 1
)
SELECT base.source, n_docs, total_tokens, distinct_docs,
       n_docs - distinct_docs AS dup_docs, n_langs,
       CAST((total_tokens - ((total_tokens % n_docs + n_docs) % n_docs))
            / n_docs AS BIGINT) AS mean_tokens,
       top_lang, top_lang_docs
FROM base JOIN tl ON base.source = tl.source
"""

_IVF_K = 16  # learned coarse-quantizer size
_IVF_NPROBE = 3
_IVF_TOPK = 5
_IVF_NQUERIES = 10


def embedding_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a LEARNED coarse quantizer — the production FAISS
    recipe (train k-means on a sample, then assign/probe), completing the
    ANN family: mod-id IVF (embedding_ivf_topk) showed the search shape,
    this one trains the quantizer with one Lloyd iteration in quantized
    integer space so training replays bit-identically in the oracle.
    Cell assignment and probing are exact integer L2 argmins; in-cell
    reranking is exact cosine computed from integer dot/norms, rounded to
    6 dp BEFORE ranking (the PQ tie-break taming), ties on neighbor_id.

    Scale: train = the kmeans fan-out on the (sampled) corpus; search =
    K-row broadcast assignment + cell-equality candidate join. Nothing
    collects; nprobe bounds read amplification exactly as in FAISS."""
    tune(spark)
    vecs = _qvecs(spark, sf_dir)
    cents = _recompute_centroids(
        _assign(vecs, _init_centroids(vecs, k=_IVF_K))
    )
    nrm = F.aggregate(
        F.transform("qv", lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    with_norm = vecs.withColumn("nrm", nrm)
    corpus = _assign(with_norm, cents).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qv").alias("cv"),
        F.col("nrm").alias("n2"),
        "cid",
    )
    probes = _assign(
        with_norm.where(F.col("vec_id") < _IVF_NQUERIES), cents, keep=_IVF_NPROBE
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("pv"),
        F.col("nrm").alias("n1"),
        "cid",
    )
    dot = F.aggregate(
        F.zip_with("pv", "cv", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        corpus.join(F.broadcast(probes), "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("dot", dot)
        .withColumn(
            "cosine", F.round(F.col("dot") / (F.sqrt("n1") * F.sqrt("n2")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _IVF_TOPK)
        .select("query_id", "neighbor_id", "cosine", F.col("rk").alias("rank"))
    )


EMBEDDING_IVF_KMEANS_ORACLE = f"""
WITH qv AS (
    SELECT vec_id, {_QV_SQL} AS qv FROM embeddings
), v AS (
    SELECT vec_id, generate_subscripts(qv, 1) AS pos, unnest(qv) AS val FROM qv
), c0 AS (
    SELECT vec_id AS cid, pos, val AS cval FROM v WHERE vec_id < {_IVF_K}
), d1 AS (
    SELECT v.vec_id, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS dist
    FROM v JOIN c0 c USING (pos) GROUP BY 1, 2
), a1 AS (
    SELECT vec_id, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d1) WHERE rk = 1
), m1 AS (
    SELECT a1.cid, v.pos,
           CAST((sum(v.val) - ((sum(v.val) % count(*) + count(*)) % count(*)))
                / count(*) AS BIGINT) AS cval
    FROM a1 JOIN v USING (vec_id) GROUP BY 1, 2
), d2 AS (
    SELECT v.vec_id, c.cid, sum((v.val - c.cval) * (v.val - c.cval)) AS dist
    FROM v JOIN m1 c USING (pos) GROUP BY 1, 2
), nrm AS (
    SELECT vec_id, (SELECT sum(x.a * x.a)
                    FROM (SELECT unnest(qv.qv) AS a) x) AS nrm
    FROM qv
), corpus AS (
    SELECT d2.vec_id AS neighbor_id, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d2) d2 WHERE rk = 1
), probes AS (
    SELECT d2.vec_id AS query_id, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM d2 WHERE vec_id < {_IVF_NQUERIES}) d2 WHERE rk <= {_IVF_NPROBE}
), scored AS (
    SELECT p.query_id, c.neighbor_id,
           round((SELECT sum(x.a * x.b)
                  FROM (SELECT unnest(pq.qv) AS a, unnest(cq.qv) AS b) x)
                 / (sqrt(pn.nrm) * sqrt(cn.nrm)), 6) AS cosine
    FROM probes p
    JOIN corpus c USING (cid)
    JOIN qv pq ON pq.vec_id = p.query_id
    JOIN qv cq ON cq.vec_id = c.neighbor_id
    JOIN nrm pn ON pn.vec_id = p.query_id
    JOIN nrm cn ON cn.vec_id = c.neighbor_id
    WHERE p.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored) WHERE rank <= {_IVF_TOPK}
"""

def corpus_drift_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two corpus slices — the data
    observability check every refreshed training corpus runs (token
    distribution of the incoming batch vs the established corpus). Slices
    reuse the deterministic md5-bucket split; per-token drift is the
    cross-multiplied integer L1 term |fa·NB − fb·NA| (comparing the
    RATES fa/NA vs fb/NB without ever dividing — stays exact in both
    engines). Top-30 drifted tokens.

    One tokenize pass, one token aggregation, totals as window sums over
    the vocabulary-bounded freq frame (an agg + broadcast here would
    re-execute the whole tokenize lineage a second time), TakeOrdered
    for the top-k — no sort of the vocabulary."""
    tune(spark)
    from pyspark.sql import Window

    from .llm_ops3 import TRAIN_BUCKET_MAX

    docs = read_table(spark, sf_dir, "documents")
    bucket = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    tok = docs.where(normalized_text("text") != "").select(
        (bucket < TRAIN_BUCKET_MAX).alias("is_a"),
        F.explode(tokens(normalized_text("text"))).alias("tok"),
    )
    freq = tok.groupBy("tok").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("fa"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("fb"),
    )
    wall = Window.partitionBy()
    return (
        freq.withColumn(
            "drift",
            F.abs(
                F.col("fa") * F.sum("fb").over(wall)
                - F.col("fb") * F.sum("fa").over(wall)
            ),
        )
        .orderBy(F.col("drift").desc(), "tok")
        .limit(30)
        .select("tok", "fa", "fb", "drift")
    )


from .llm_ops3 import TRAIN_BUCKET_MAX as _BUCKET_MAX  # ONE split-point constant

CORPUS_DRIFT_ORACLE = f"""
WITH tok AS (
    SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_BUCKET_MAX}' AS is_a,
           unnest({_TOKS}) AS tok
    FROM documents WHERE {_NORM} <> ''
), freq AS (
    SELECT tok,
           CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS fa,
           CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS fb
    FROM tok GROUP BY tok
), tot AS (
    SELECT CAST(sum(fa) AS BIGINT) AS na, CAST(sum(fb) AS BIGINT) AS nb FROM freq
)
SELECT tok, fa, fb, CAST(abs(fa * nb - fb * na) AS BIGINT) AS drift
FROM freq, tot
ORDER BY drift DESC, tok LIMIT 30
"""


def multimodal_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup end-to-end: binary payloads → Arrow mapInPandas
    feature/digest extraction (operators/multimodal.py — the decode step
    is the honest stub, the digest is a pure function of the payload
    bytes) → exact dedup on the content digest, keep-lowest-id. The
    perceptual-hash dedup shape: swap the md5 for a real pHash inside the
    same Arrow batch and the plan is unchanged.

    The groupBy shuffles (digest, doc_id, n_bytes) — never payload bytes:
    at 100 TB of media the shuffle carries 16-byte digests."""
    tune(spark)
    from ..operators.multimodal import extract_media_features

    docs = read_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    feats = extract_media_features(payloads)
    return feats.groupBy("digest").agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
        F.min("n_bytes").alias("n_bytes"),
    )


MULTIMODAL_DEDUP_ORACLE = """
SELECT md5(text) AS digest,
       min(doc_id) AS keep_id,
       count(*) AS n_copies,
       CAST(min(octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_bytes
FROM documents
GROUP BY 1
"""

def embedding_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION population-stability index between the established
    corpus and an incoming embedding batch — the observability twin of
    the IVF cell-skew audit: cell skew says WHERE drifted vectors land,
    PSI says WHICH dimensions moved (an embedding-model regression, a
    domain shift, a pipeline bug each light up differently). The split
    reuses the lifecycle's residue class (``vec_id % 50 == 17`` is the
    batch). Each dimension's values are clamped into 8 fixed-width bins
    over [-1, 1); PSI = Σ (pa − pb)·ln(pa/pb) over the observed buckets
    with add-half Laplace smoothing, so a zero count never divides.

    One posexplode pass (rows × 64 dims), one shuffle to (dim, bucket) —
    512 groups regardless of corpus size; the per-dim totals come from
    windows over that bounded frame, never a second corpus scan. At
    100 TB: the explode is map-side, everything after is O(dims·bins)."""
    tune(spark)
    emb = read_table(spark, sf_dir, "embeddings")
    x = emb.select(
        (F.col("vec_id") % 50 == 17).alias("is_batch"),
        F.posexplode(F.col("embedding")).alias("dim", "val"),
    )
    bucket = F.least(
        F.greatest(F.floor((F.col("val").cast("double") + 1.0) * 4.0), F.lit(0)),
        F.lit(7),
    ).cast("int")
    b = x.groupBy("dim", bucket.alias("bucket")).agg(
        F.sum(F.when(F.col("is_batch"), 0).otherwise(1)).alias("ca"),
        F.sum(F.when(F.col("is_batch"), 1).otherwise(0)).alias("cb"),
    )
    wd = Window.partitionBy("dim")
    pa = (F.col("ca") + 0.5) / (F.sum("ca").over(wd) + 4.0)
    pb = (F.col("cb") + 0.5) / (F.sum("cb").over(wd) + 4.0)
    return (
        b.withColumn("term", (pa - pb) * F.log(pa / pb))
        .groupBy("dim")
        .agg(
            F.round(F.sum("term"), 6).alias("psi"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


EMBEDDING_DRIFT_PSI_ORACLE = """
WITH x AS (
    SELECT vec_id % 50 = 17 AS is_batch,
           unnest(range(len(embedding))) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
), b AS (
    SELECT dim,
           CAST(least(greatest(floor((val + 1.0) * 4.0), 0), 7) AS INT) AS bucket,
           sum(CASE WHEN is_batch THEN 0 ELSE 1 END) AS ca,
           sum(CASE WHEN is_batch THEN 1 ELSE 0 END) AS cb
    FROM x GROUP BY 1, 2
), t AS (
    SELECT dim, sum(ca) AS na, sum(cb) AS nb FROM b GROUP BY 1
)
SELECT CAST(b.dim AS INT) AS dim,
       round(sum(((ca + 0.5) / (na + 4.0) - (cb + 0.5) / (nb + 4.0))
                 * ln(((ca + 0.5) / (na + 4.0))
                      / ((cb + 0.5) / (nb + 4.0)))), 6) AS psi,
       count(*) AS n_buckets
FROM b JOIN t USING (dim)
GROUP BY b.dim
"""


REGISTRY: list[tuple] = [
    ("embedding_drift_psi", embedding_drift_psi, EMBEDDING_DRIFT_PSI_ORACLE),
    ("embedding_kmeans", embedding_kmeans, EMBEDDING_KMEANS_ORACLE),
    (
        "cluster_prototype_selection",
        cluster_prototype_selection,
        CLUSTER_PROTOTYPE_ORACLE,
    ),
    ("semantic_dedup", semantic_dedup, SEMANTIC_DEDUP_ORACLE),
    ("quality_linear_classifier", quality_linear_classifier, QUALITY_CLASSIFIER_ORACLE),
    ("bpe_merge_induction", bpe_merge_induction, BPE_MERGE_ORACLE),
    ("dataset_card_stats", dataset_card_stats, DATASET_CARD_ORACLE),
    ("embedding_ivf_kmeans_topk", embedding_ivf_kmeans_topk, EMBEDDING_IVF_KMEANS_ORACLE),
    ("duplicated_ngram_spans", duplicated_ngram_spans, DUP_NGRAM_ORACLE),
    ("corpus_drift_l1", corpus_drift_l1, CORPUS_DRIFT_ORACLE),
    ("multimodal_dedup_pipeline", multimodal_dedup_pipeline, MULTIMODAL_DEDUP_ORACLE),
    ("bpe_encode_corpus", bpe_encode_corpus, BPE_ENCODE_ORACLE),
    ("chat_template_assembly", chat_template_assembly, CHAT_TEMPLATE_ORACLE),
    ("contrastive_pair_mining", contrastive_pair_mining, _contrastive_oracle()),
]
