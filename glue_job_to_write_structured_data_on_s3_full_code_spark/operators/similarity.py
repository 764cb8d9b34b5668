"""Similarity search over embedding columns (SURVEY.md §7 M5).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the query set,
  one pass over the corpus, per-query top-k via window. At 100 TB the
  corpus side stays partition-parallel and nothing shuffles except the
  (tiny) per-query candidate sets after local reduction.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane (sign) LSH
  assigns each vector a bucket key; queries probe only their own bucket,
  turning the N×Q cross product into an equality join. Recall is traded
  for cost; exactness is recovered per-bucket with true cosine.
- :func:`ivf_topk` — the other classic scale path (IVF): a small
  deterministic centroid set coarse-quantizes the corpus once (broadcast
  argmax-cosine assignment, no shuffle of the corpus), queries probe their
  ``nprobe`` nearest cells, and the candidate join is an equality join on
  the cell id. At 100 TB the corpus partition would be *stored* bucketed
  by cell id, so probing reads only the probed cells.
- :func:`cosine_neardup` — embedding-cosine near-duplicate dedup: a pair
  is a near-dup when cosine ≥ threshold; each vector keeps/drops by
  whether a smaller-id near-dup exists (greedy representative).

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM expressions, no
Python UDF. Embeddings are cast to double before arithmetic so results
match DuckDB's double math bit-for-bit (then rounded for the hash gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import spread_small_input


def _dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns via zip_with + aggregate.

    Measured note: expanding to a flat ``a[0]*b[0] + …`` expression is
    ~2.6× SLOWER (the deep Add tree falls out of codegen into interpreted
    evaluation with per-term bounds checks); the higher-order form stays.
    Folds left-to-right, matching DuckDB's ordered unnest sum bit-for-bit.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_sql(a: str, b: str) -> str:
    """The SQL spelling of :func:`_dot` over two column NAMES — parses to
    the identical Catalyst tree (ArrayAggregate over ArraysZipWith, double
    zero seed, left-to-right fold)."""
    return (
        f"aggregate(zip_with(`{a}`, `{b}`, (x, y) -> x * y), 0.0D, "
        "(acc, v) -> acc + v)"
    )


def _cosine_cols(a: str, b: str) -> Column:
    """``cosine(`a`, `b`)`` as ONE parsed expression.

    Value-identical to composing :func:`_dot` + ``F.sqrt`` Column ops (the
    parser builds the same expression nodes), but costs a single py4j
    round-trip instead of ~60: every ``F.zip_with``/``F.aggregate`` lambda
    crosses the Python↔JVM socket once per sub-expression, and the cosine
    block (3 dots + 2 sqrts) repeated across the ANN family made plan
    CONSTRUCTION a measured multi-second driver cost per query (r15,
    guide §1/§7.3 — driver-side work the cluster never parallelizes)."""
    return F.expr(
        f"{_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    )


def _norm_col(vec: str) -> Column:
    """``sqrt(dot(v, v))`` — EXACTLY the denominator factor
    :func:`_cosine_cols` computes (same parsed tree over the same input,
    so the same double), hoisted so pairwise scorers can evaluate it once
    per ROW instead of once per PAIR."""
    return F.expr(f"sqrt({_dot_sql(vec, vec)})")


def _cosine_pre(a: str, b: str, na: str, nb: str) -> Column:
    """Cosine over vector columns whose norms were precomputed with
    :func:`_norm_col` (r16, guide §1.2 per-task work): every pairwise
    scorer in this module evaluates cosine inside a join, where
    ``_cosine_cols`` recomputes BOTH self-dots per pair — 3 dot products
    where 1 suffices (the IVF corpus assignment scores N·max_centroids
    pairs, the exact baseline N·Q). Bit-identical to ``_cosine_cols``:
    ``na``/``nb`` hold the very same ``sqrt(dot(x, x))`` doubles the
    inline form would produce, and IEEE multiply/divide of equal inputs
    is equal output (pinned by tests/test_r16_optimizations.py)."""
    return F.expr(f"{_dot_sql(a, b)} / (`{na}` * `{nb}`)")


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _as_double_name(name: str) -> Column:
    """:func:`_as_double` over a column NAME as one parsed expression (same
    tree, one py4j round-trip — see :func:`_cosine_cols`)."""
    return F.expr(f"transform(`{name}`, x -> CAST(x AS DOUBLE))")


#: Shared rounding precision for every near-dup threshold compare — one
#: constant so a future precision change cannot drift one strategy.
_COSINE_DP = 6


def _round_cosine(cosine: Column) -> Column:
    """Spark-side half of the round-before-compare contract."""
    return F.round(cosine, _COSINE_DP)


def _np_neardup_hits(sims, threshold: float):
    """numpy-side half of the round-before-compare contract: boolean hit
    matrix for a similarity matrix, rounded to ``_COSINE_DP`` first so the
    decision matches the expression strategy and the DuckDB oracle
    regardless of float summation order."""
    import numpy as np

    return np.round(sims, _COSINE_DP) >= threshold


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-matches kept out
    by id inequality). Output: query_id, neighbor_id, cosine (rounded)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_name(vec_col).alias("qv")
    ).withColumn("_nq", _norm_col("qv"))
    # broadcast probes inherit the scan's partitioning; a small corpus file
    # is ONE partition and would score single-threaded (see cosine_neardup)
    c = spread_small_input(corpus).select(
        F.col(id_col).alias("neighbor_id"), _as_double_name(vec_col).alias("cv")
    ).withColumn("_nc", _norm_col("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_pre("qv", "cv", "_nq", "_nc").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rk").alias("rank"),
        )
    )


def cosine_neardup(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.35,
    strategy: str = "expr",
    num_blocks: int = 8,
    matmul_max_rows: int | None = None,
) -> DataFrame:
    """Exact embedding-cosine near-dup dedup (task brief: dedup family).

    Output per vector: ``n_smaller_neardups`` (how many near-dups with a
    smaller id exist) and ``kept`` (no smaller near-dup → this vector is
    the cluster representative) — the same keep-min-id rule as
    :func:`..dedup.exact_dedup`.

    This exact form is the oracle semantics; it is O(N²) and only viable
    on a bounded corpus. At 100 TB the candidate pairs come from the LSH
    buckets of :func:`lsh_bucketed_topk` (or IVF cells) instead of the
    self cross-join — same scoring, same keep rule.

    The threshold compare is on ``round(cosine, 6)`` in EVERY strategy
    (and in the DuckDB oracle): float64 summation order differs between
    BLAS, Spark expressions, and DuckDB, so a raw compare can flip for a
    pair within a few ulps of the threshold — rounding first makes the
    decision order-independent (the same round-before-rank taming the
    ADC path uses).

    ``strategy``:

    - ``'expr'`` — broadcast nested-loop join scored with JVM
      ``zip_with``/``aggregate`` expressions. No Python in the path, but
      higher-order functions run interpreted: N²·dim per-element
      evaluation dominates once N·dim is large (and pays a multi-second
      JIT warm-up on first execution).
    - ``'matmul'`` — the same broadcast shape, vectorized: the reference
      matrix ships to every task via ``sparkContext.broadcast`` and each
      corpus partition scores all its rows against it in one numpy
      matmul (BLAS). ~50× faster at 2k×64 — but for self-comparison the
      "reference side" IS the corpus, so this strategy collects the
      whole input to the driver: it is hard-capped at
      ``matmul_max_rows`` (default 100k) and raises ``ValueError``
      above that instead of OOMing the driver.
    - ``'blocked'`` — the distributed exact form (default for the
      registered query): vectors are hashed into ``num_blocks`` id
      blocks, every unordered block PAIR becomes one task, and each task
      BLAS-matmuls just its two blocks. Nothing is ever collected to the
      driver and per-task memory is 2·N/num_blocks vectors — at 100 TB
      you raise num_blocks until a block fits an executor. Total compute
      is still exact-O(N²) (that is the semantics); the sub-quadratic
      route remains LSH/IVF candidate generation.
    """
    if strategy == "matmul":
        return _cosine_neardup_matmul(
            corpus,
            vec_col,
            id_col,
            threshold,
            max_rows=(
                _MATMUL_MAX_ROWS if matmul_max_rows is None else matmul_max_rows
            ),
        )
    if strategy == "blocked":
        return _cosine_neardup_blocked(
            corpus, vec_col, id_col, threshold, num_blocks=num_blocks
        )
    v = corpus.select(
        F.col(id_col).alias("vid"), _as_double_name(vec_col).alias("vv")
    ).withColumn("vnorm", F.sqrt(_dot(F.col("vv"), F.col("vv"))))

    # a small corpus arrives as ONE input partition; the broadcast
    # nested-loop probe then runs single-threaded. Spread the probe side
    # over the cluster — at 100 TB the scan is already partitioned and
    # this is a no-op knob.
    hi = spread_small_input(v).select(
        F.col("vid").alias("id_hi"), F.col("vv").alias("v_hi"), F.col("vnorm").alias("n_hi")
    )
    lo = v.select(
        F.col("vid").alias("id_lo"), F.col("vv").alias("v_lo"), F.col("vnorm").alias("n_lo")
    )
    pairs = (
        hi.join(F.broadcast(lo), F.col("id_hi") > F.col("id_lo"))
        .select(
            "id_hi",
            _round_cosine(
                _dot(F.col("v_hi"), F.col("v_lo"))
                / (F.col("n_hi") * F.col("n_lo"))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    cnt = pairs.groupBy("id_hi").agg(F.count("*").alias("n_smaller_neardups"))
    return (
        v.join(cnt, v["vid"] == cnt["id_hi"], "left")
        .select(
            F.col("vid").alias(id_col),
            F.coalesce("n_smaller_neardups", F.lit(0)).alias("n_smaller_neardups"),
            (F.coalesce("n_smaller_neardups", F.lit(0)) == 0).alias("kept"),
        )
    )


_MATMUL_MAX_ROWS = 100_000  # driver-collect guard for the matmul strategy


def _cosine_neardup_matmul(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    max_rows: int = _MATMUL_MAX_ROWS,
) -> DataFrame:
    """Vectorized twin of :func:`cosine_neardup` (see its docstring).

    cosine(i,j) = dot(v_i, v_j) / (|v_i|·|v_j|) computed as a row-chunked
    matmul against the broadcast reference matrix; division by the norm
    product happens per pair (NOT by pre-normalizing rows) so the float
    operation order matches the expression strategy and the DuckDB oracle
    as closely as float64 allows.

    This strategy collects the corpus to the driver to build the
    broadcast reference matrix, so it REFUSES inputs above ``max_rows``
    (raising ``ValueError``) rather than OOMing the driver.  The guard and
    the collect are ONE Spark action — ``limit(max_rows + 1).collect()``,
    then a length check — so a source that grows between a separate probe
    and the collect can never slip past the cap, and the well-under-cap
    case pays no extra job.  Above the cap, use strategy='blocked'.
    """
    import numpy as np

    spark = corpus.sparkSession
    ref_rows = corpus.select(F.col(id_col), F.col(vec_col)).limit(
        max_rows + 1
    ).collect()
    if len(ref_rows) > max_rows:
        raise ValueError(
            f"cosine_neardup strategy='matmul' collects the corpus to the "
            f"driver and is capped at {max_rows} rows (input has more); "
            f"use strategy='blocked' for unbounded corpora"
        )
    if not ref_rows:
        return corpus.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_smaller_neardups"),
            F.lit(True).alias("kept"),
        )
    ref_ids = np.array([r[0] for r in ref_rows], dtype=np.int64)
    ref_mat = np.array([r[1] for r in ref_rows], dtype=np.float64)
    ref_norm = np.sqrt((ref_mat * ref_mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ref_ids, ref_mat, ref_norm))

    def score(batches):
        import pandas as pd

        r_ids, r_mat, r_norm = bc.value
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            x_ids = pdf[id_col].to_numpy()
            hit = _np_neardup_hits(
                (x @ r_mat.T)
                / (np.sqrt((x * x).sum(axis=1))[:, None] * r_norm[None, :]),
                threshold,
            )
            cnt = (hit & (r_ids[None, :] < x_ids[:, None])).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: x_ids,
                    "n_smaller_neardups": cnt.astype(np.int64),
                    "kept": cnt == 0,
                }
            )

    return (
        spread_small_input(corpus.select(id_col, vec_col))
        .mapInPandas(
            score, f"{id_col} long, n_smaller_neardups long, kept boolean"
        )
    )


def _cosine_neardup_blocked(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    num_blocks: int = 8,
) -> DataFrame:
    """Driver-collect-free exact twin of :func:`cosine_neardup` (see its
    docstring): the classic blocked all-pairs ("triangle") self-join.

    Every vector lands in block ``id % num_blocks``; replicating each row
    once per block (one cross join with a ``num_blocks``-row frame) puts
    the union of blocks i and j — each row exactly once — into group
    (min(i,j), max(i,j)). One ``applyInPandas`` per unordered block pair
    then scores its two blocks with a single BLAS matmul and emits
    per-vector partial counts of smaller-id near-dups; a final sum-groupBy
    (every vector emits a row in each of its ``num_blocks`` groups, so no
    re-join against the corpus is needed for the zero rows) yields the
    same keep-min-id output as the other strategies.  Every strategy (and
    the oracle) compares ``round(cosine, 6)`` to the threshold, so the
    decision is independent of float summation order — identical across
    strategies except at exact 6-dp rounding half-points, where the
    engines' rounding modes differ (numpy half-to-even vs Spark/DuckDB
    half-away variants); computed cosines land there with measure-zero
    probability, and the boundary tests deliberately stay ±5e-7 away.

    Scale shape: shuffle volume is num_blocks·N rows (the replication),
    task memory is two blocks of vectors, and there are
    num_blocks·(num_blocks+1)/2 independent tasks — num_blocks is the
    knob that trades replication for per-task memory at 100 TB.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    # pmod, not %: Spark's % keeps the dividend's sign, and a negative id
    # would land in a negative block never paired by the 0..num_blocks-1
    # replication frame below — silently dropping its cross-block pairs
    v = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(num_blocks)).cast("int").alias("blk"),
    )
    others = spark.range(num_blocks).select(F.col("id").cast("int").alias("other"))
    repl = v.crossJoin(F.broadcast(others)).select(
        "vid",
        "vec",
        "blk",
        F.least("blk", "other").alias("g1"),
        F.greatest("blk", "other").alias("g2"),
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vid"].to_numpy(dtype=np.int64)
        mat = np.array(pdf["vec"].tolist(), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        g1 = int(pdf["g1"].iloc[0])
        g2 = int(pdf["g2"].iloc[0])
        if g1 == g2:
            hit = _np_neardup_hits(
                (mat @ mat.T) / (norms[:, None] * norms[None, :]), threshold
            )
            cnt = (hit & (ids[None, :] < ids[:, None])).sum(axis=1)
            return pd.DataFrame({"vid": ids, "n": cnt.astype(np.int64)})
        a = pdf["blk"].to_numpy() == g1
        b = ~a
        hit = _np_neardup_hits(
            (mat[a] @ mat[b].T) / (norms[a][:, None] * norms[b][None, :]),
            threshold,
        )
        cnt_a = (hit & (ids[b][None, :] < ids[a][:, None])).sum(axis=1)
        cnt_b = (hit.T & (ids[a][None, :] < ids[b][:, None])).sum(axis=1)
        return pd.DataFrame(
            {
                "vid": np.concatenate([ids[a], ids[b]]),
                "n": np.concatenate([cnt_a, cnt_b]).astype(np.int64),
            }
        )

    partial = repl.groupBy("g1", "g2").applyInPandas(score, "vid long, n long")
    return (
        partial.groupBy("vid")
        .agg(F.sum("n").alias("n_smaller_neardups"))
        .select(
            F.col("vid").alias(id_col),
            "n_smaller_neardups",
            (F.col("n_smaller_neardups") == 0).alias("kept"),
        )
    )


def _ivf_centroids(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    centroid_mod: int,
    max_centroids: int,
) -> DataFrame:
    """The deterministic mod-id centroid set shared by the in-memory IVF
    and the partitioned stored index (and spelled identically by the
    DuckDB oracle)."""
    return corpus.where(
        (F.col(id_col) % centroid_mod == 0)
        & (F.col(id_col) < centroid_mod * max_centroids)
    ).select(
        F.col(id_col).alias("cent_id"), _as_double_name(vec_col).alias("cent_v")
    )


def _ivf_assign(
    df: DataFrame,
    cents: DataFrame,
    side_id: str,
    side_vec: str,
    keep: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Max-cosine cell assignment against the broadcast centroid set —
    ``keep`` best cells (1 for corpus rows, nprobe for queries); ties on
    cent_id. ``rank_col`` retains the 1-based probe rank under that name
    (ivf_topk_curve slices one shared candidate set by it).

    The ``keep=1`` corpus path is an argmax, NOT a top-n, so it runs as a
    ``max_by`` hash aggregate instead of a row_number window: the window
    would shuffle all N·max_centroids scored rows to sort per id, while
    the aggregate map-side-combines each id's candidates down to one row
    BEFORE the exchange — a max_centroids× shuffle-volume cut on the path
    every index build/append/topk corpus assignment takes. Tie-break
    (max cosine, then min cent_id) matches the window ordering exactly:
    the max_by key struct compares cosine first, then the negated id."""
    from pyspark.sql import Window

    # norms once per row / per centroid, not once per (row, centroid) pair:
    # the assignment scores N·max_centroids pairs — with inline cosine that
    # is 3 N·C dot products, with hoisted norms it is N·C + N + C (r16)
    scored = (
        df.withColumn("_nv", _norm_col(side_vec))
        .crossJoin(F.broadcast(cents.withColumn("_ncent", _norm_col("cent_v"))))
        .select(
            side_id,
            side_vec,
            "cent_id",
            _cosine_pre(side_vec, "cent_v", "_nv", "_ncent").alias("cent_cos"),
        )
    )
    if keep == 1 and rank_col is None:
        return (
            scored.groupBy(side_id)
            .agg(
                F.max_by(
                    F.struct(F.col("cent_id"), F.col(side_vec)),
                    F.struct(
                        F.col("cent_cos").alias("c"),
                        (-F.col("cent_id")).alias("tb"),
                    ),
                ).alias("_best")
            )
            .select(
                side_id,
                F.col(f"_best.{side_vec}").alias(side_vec),
                F.col("_best.cent_id").alias("cent_id"),
            )
        )
    w = Window.partitionBy(side_id).orderBy(
        F.col("cent_cos").desc(), F.col("cent_id")
    )
    assigned = (
        scored.withColumn("crk", F.row_number().over(w))
        .where(F.col("crk") <= keep)
        .drop("cent_cos")
    )
    if rank_col is not None:
        return assigned.withColumnRenamed("crk", rank_col)
    return assigned.drop("crk")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    centroid_mod: int = 50,
    nprobe: int = 3,
    max_centroids: int = 256,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer.

    The centroid set is deterministic — corpus vectors whose id is
    divisible by ``centroid_mod``, CAPPED at ``max_centroids`` — so
    results are reproducible without driver-side k-means state, and the
    one-pass assignment stays O(N·max_centroids): a mod rule alone would
    grow the centroid count (and the assignment cost) linearly with the
    corpus. Corpus vectors are assigned to their
    max-cosine centroid (one broadcast pass); each query probes its
    ``nprobe`` best cells and scores exact cosine only inside them.
    """
    from pyspark.sql import Window

    cents = _ivf_centroids(corpus, vec_col, id_col, centroid_mod, max_centroids)

    c = _ivf_assign(
        spread_small_input(corpus).select(
            F.col(id_col).alias("neighbor_id"), _as_double_name(vec_col).alias("cv")
        ),
        cents,
        "neighbor_id",
        "cv",
        keep=1,
    )
    q = _ivf_assign(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double_name(vec_col).alias("qv")
        ),
        cents,
        "query_id",
        "qv",
        keep=nprobe,
    )

    scored = (
        c.withColumn("_nc", _norm_col("cv"))
        .join(F.broadcast(q.withColumn("_nq", _norm_col("qv"))), "cent_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_pre("qv", "cv", "_nq", "_nc").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rk").alias("rank"),
        )
    )


def ivf_topk_curve(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    centroid_mod: int = 50,
    nprobe_max: int = 3,
    max_centroids: int = 256,
) -> DataFrame:
    """The nprobe tuning curve — :func:`ivf_topk` at every probe depth
    1..``nprobe_max`` from ONE shared pass, for recall/cost telemetry
    (``ann_recall_report``).

    Running ivf_topk per depth repeats the expensive part — the
    O(N·max_centroids) corpus assignment and the in-cell scoring join —
    once per depth. Here both run once: corpus cells are depth-independent,
    each query keeps its ``nprobe_max`` best cells WITH the probe rank,
    and since every corpus row lives in exactly one cell, each scored
    (query, neighbor) candidate carries the unique probe rank of its cell.
    The depth-n result is then just candidates with ``probe_rank <= n``,
    re-ranked per depth with ivf_topk's exact (cosine DESC, neighbor_id)
    tie-break — row-identical to ivf_topk(nprobe=n) for every n (asserted
    in tests/test_similarity.py). The depth fan-out is a 3-row broadcast
    against the already-scored candidate frame, so the curve costs one
    assignment + one join + one window regardless of nprobe_max.
    """
    from pyspark.sql import Window

    cents = _ivf_centroids(corpus, vec_col, id_col, centroid_mod, max_centroids)
    c = _ivf_assign(
        spread_small_input(corpus).select(
            F.col(id_col).alias("neighbor_id"), _as_double_name(vec_col).alias("cv")
        ),
        cents,
        "neighbor_id",
        "cv",
        keep=1,
    )
    q = _ivf_assign(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double_name(vec_col).alias("qv")
        ),
        cents,
        "query_id",
        "qv",
        keep=nprobe_max,
        rank_col="probe_rank",
    )

    pairs = (
        c.withColumn("_nc", _norm_col("cv"))
        .join(F.broadcast(q.withColumn("_nq", _norm_col("qv"))), "cent_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            "probe_rank",
            _cosine_pre("qv", "cv", "_nq", "_nc").alias("cosine"),
        )
    )
    levels = corpus.sparkSession.range(1, nprobe_max + 1).select(
        F.col("id").cast("int").alias("nprobe")
    )
    leveled = pairs.join(
        F.broadcast(levels), F.col("probe_rank") <= F.col("nprobe")
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        leveled.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "nprobe",
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rk").alias("rank"),
        )
    )


#: index paths this session has already built (applicationId-scoped, so
#: cross-session staleness is impossible); see ivf_partitioned_topk(rebuild=)
_BUILT_IVF_INDEXES: set[str] = set()


class UnsupportedIndexFilesystem(RuntimeError):
    """The stored-IVF lifecycle was pointed at a filesystem that cannot
    honor its durability contract. Every crash-atomicity guarantee the
    index makes — torn-free fingerprint/manifest publish, the
    single-writer lock, rename-aside/rename-publish swaps in
    append/compact/rebalance/repair — is built on POSIX primitives
    (atomic same-directory ``rename(2)`` and ``O_CREAT|O_EXCL``).
    Object stores (s3/s3a/gs/abfs/...) have NEITHER: "rename" is
    copy+delete (non-atomic, a crash mid-copy leaves both halves) and
    there is no exclusive-create file lock, so the index would *appear*
    to work until the first crash or concurrent writer silently
    corrupted it. Refusing loudly here beats that. See COVERAGE.md
    "Stored-IVF filesystem contract" for the primitive-by-primitive
    contract and the object-store commit design (immutable generation
    dirs + conditional-put latest pointer)."""


def _require_posix_warehouse(
    uri: str, what: str = "spark.sql.warehouse.dir"
) -> str:
    """Enforce the stored-index filesystem contract at the single
    chokepoint every lifecycle entry point resolves paths through.
    Accepts local paths (no scheme) and ``file:`` URIs, returning the
    plain OS path; raises :class:`UnsupportedIndexFilesystem` for any
    other scheme rather than letting ``os.path.join`` silently treat
    ``s3a://bucket/...`` as a relative local directory name. ``what``
    names the offending setting in the error (the generational store
    routes its explicit ``root=`` through here too)."""
    import os
    import re

    # URI-vs-path classification, done by SYNTAX rather than urlsplit's
    # permissive parse: a plain local path may legally contain a colon in
    # a segment ('runs:2026/idx' — not a URI: what follows the colon is
    # not a path-absolute or authority part; 'data/v1:/idx' and
    # '2026:/idx' — not URIs either: the head is not a legal RFC 3986
    # scheme), while Hadoop URIs appear both as scheme://authority/path
    # AND the single-slash scheme:/path form ('hdfs:/user/hive/warehouse'
    # is common) — BOTH must classify as URIs or a non-file scheme slips
    # past the refusal and the index splits brain: os.* state under a
    # local dir literally named 'hdfs:', Spark data on the real
    # filesystem.
    if os.path.isabs(uri):
        return uri  # absolute local path, colons in segments and all
    head, sep, rest = uri.partition(":")
    if not sep or not re.fullmatch(r"[A-Za-z][A-Za-z0-9+.\-]*", head):
        # no colon, or the head cannot be a URI scheme (must be a letter
        # followed by letters/digits/+/-/.) — a local path either way
        return uri
    scheme = head.lower()
    if scheme == "file":
        # normalize EVERY file: form to the plain OS path Hadoop would
        # resolve it to, keeping the path VERBATIM ('#'/'?' are legal in
        # filenames; no URL fragment/query truncation): file://host/path
        # drops the (local-or-meaningless) authority, file:/abs stays
        # absolute, and file:rel is relative to the working directory —
        # the same base the os.* layer resolves 'rel' against (returning
        # it verbatim instead would split pointer state into a local dir
        # literally named 'file:rel' while Spark wrote data to ./rel)
        if rest.startswith("//"):
            after = rest[2:]
            slash = after.find("/")
            return after[slash:] if slash >= 0 else "/"
        if not rest:
            # bare 'file:' — returning '' would make downstream
            # os.path.join silently resolve to the CURRENT WORKING
            # DIRECTORY, a surprise location for durable index state
            raise ValueError(
                f"{what} is the bare URI 'file:' with no path — give an "
                f"explicit location ('file:/abs/path' or a plain path)"
            )
        return rest
    if not rest.startswith("/"):
        # scheme-shaped head but the remainder is not a URI path — a
        # relative local name like 'runs:2026/idx'
        return uri
    raise UnsupportedIndexFilesystem(
        f"stored-IVF indexes require a POSIX filesystem (atomic rename + "
        f"O_EXCL) but {what} is '{uri}' (scheme "
        f"'{scheme}'). Object stores lack atomic rename and exclusive "
        f"create, so the index's crash-atomicity and single-writer "
        f"guarantees would not hold. Point the warehouse at a local/NFS "
        f"path, or see COVERAGE.md 'Stored-IVF filesystem contract' for "
        f"the object-store commit design."
    )


def _ivf_index_path(spark, index_name: str) -> str:
    """Application-scoped on-disk location for a stored IVF index: the
    heartbeat-swept per-application staging dir, so a stale index from a
    dead session is reclaimed, never served. Refuses non-POSIX warehouse
    schemes (see :func:`_require_posix_warehouse`)."""
    import os

    from ..sources.parquet import _touch_heartbeat

    warehouse = _require_posix_warehouse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    )
    app_dir = os.path.join(
        warehouse, "_staged_results", spark.sparkContext.applicationId
    )
    _touch_heartbeat(app_dir)
    return os.path.join(app_dir, index_name)


def ivf_index_built(spark, index_name: str) -> bool:
    """True iff THIS session already built (or appended to) the named
    stored index — the gate callers use to run build+append exactly once
    per session before serving probes."""
    import os

    path = _ivf_index_path(spark, index_name)
    return path in _BUILT_IVF_INDEXES and os.path.isdir(path)


def _corpus_fingerprint(df: DataFrame, id_col: str) -> dict:
    """Order-independent corpus identity: row count + bit_xor of 64-bit id
    hashes. One column-pruned scan, one single-row collect. XOR composes
    under append (fp(A ∪ B).id_xor == fp(A).id_xor ^ fp(B).id_xor), which
    is what lets :func:`ivf_index_append` maintain the stored fingerprint
    without rescanning the whole index."""
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.expr(f"bit_xor(xxhash64({id_col}))").alias("id_xor"),
    ).collect()[0]
    return {"rows": int(row["rows"]), "id_xor": int(row["id_xor"] or 0)}


def _fp_core(fp: dict) -> dict:
    """The corpus-identity projection of a stored fingerprint. The stored
    JSON may carry bookkeeping beyond identity (``last_token`` for
    at-least-once append replay detection); probe/verify must compare
    identity only, or a token-carrying index would never match a freshly
    computed corpus fingerprint."""
    return {"rows": fp["rows"], "id_xor": fp["id_xor"]}


def _read_fingerprint(path: str) -> dict:
    import json
    import os

    with open(os.path.join(f"{path}__meta", "fingerprint.json")) as fh:
        return json.load(fh)


def _read_fingerprint_or_none(path: str) -> dict | None:
    """One behavior for every 'if the index has a fingerprint' site
    (build's rebuild detection, append's replay fast path) — hand-rolled
    variants of this drift."""
    try:
        return _read_fingerprint(path)
    except FileNotFoundError:
        return None


def _centroid_token(spark, path: str) -> dict:
    """Identity of the stored centroid SET (count + bit_xor of cent_id
    hashes, one scan of the ≤``max_centroids``-row meta table). An append
    stages its assignment against the centroids it read BEFORE taking the
    lock; if a rebalance swapped the centroid set in between, publishing
    that assignment would land rows in parent cells that no longer exist
    in the refined set — unreachable by probes (which only visit cells the
    live centroids name) yet counted by the fingerprint. Appends re-check
    this token under the lock and raise instead."""
    return _corpus_fingerprint(
        spark.read.parquet(f"{path}__meta/centroids"), "cent_id"
    )


def _write_fingerprint(path: str, fp: dict) -> None:
    """Atomic replace: write a temp file in the same dir and rename over
    the old fingerprint, so a reader never sees a torn/partial JSON and a
    crash mid-write leaves the previous fingerprint intact."""
    import json
    import os
    import uuid

    meta = f"{path}__meta"
    os.makedirs(meta, exist_ok=True)
    tmp = os.path.join(meta, f".fingerprint.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(fp, fh)
    os.replace(tmp, os.path.join(meta, "fingerprint.json"))


def _write_append_manifest(
    staging: str, batch_fp: dict, token, centroid_token: dict
) -> None:
    """Write the append's write-ahead manifest into the staging dir (see
    :func:`ivf_index_append`). Temp-file + rename so a crash mid-write
    leaves no torn manifest — repair treats a manifest-less staging dir
    as a pre-publish crash and sweeps it."""
    import glob
    import json
    import os

    manifest = {
        "kind": "append",
        "files": sorted(
            os.path.relpath(p, staging)
            for p in glob.glob(os.path.join(staging, "cell_id=*", "*.parquet"))
        ),
        "batch_fp": dict(batch_fp),
        "token": token,
        "centroid_token": dict(centroid_token),
    }
    tmp = os.path.join(staging, ".manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(staging, "manifest.json"))


class ConcurrentIndexMutation(RuntimeError):
    """A second writer tried to mutate a stored IVF index while another
    mutation held the lock. The index maintains a SINGLE-WRITER contract:
    appends compose the stored fingerprint read-modify-write, so two
    interleaved appends could land both row batches while one batch's
    contribution is lost from the fingerprint — every later fingerprint
    check would then wrongly fail (or worse, pass against the wrong
    corpus). Compaction and rebalance read index state and rewrite whole
    cell directories, so overlapping them with an append would double or
    drop the overlapped batch's rows. Raising beats silently corrupting
    index data or metadata; the caller serializes mutations (retry after
    the holder finishes)."""


class IndexMaintenanceError(RuntimeError):
    """Post-publish maintenance (auto-compaction) failed AFTER the append
    durably landed its batch and advanced the fingerprint. The batch is
    IN the index: retrying the append would duplicate it in a way the
    XOR fingerprint cannot see (dup ids XOR-cancel), so this is a
    distinct type whose message says what to retry — the compaction, via
    :func:`ivf_index_compact` — and what not to."""


def _read_lock_holder(lock_file: str) -> dict | None:
    """Best-effort read of a lock file's holder payload. Tolerates a
    missing file (lost the race the other way), an empty or torn file
    (pre-payload crash, or a lock created by an older version / by
    hand) — holder identity is diagnostic, never load-bearing."""
    import json

    try:
        with open(lock_file) as fh:
            payload = json.load(fh)
    except (FileNotFoundError, ValueError):
        return None
    if isinstance(payload, dict) and {"host", "pid"} <= payload.keys():
        return payload
    return None


class _index_write_lock:
    """O_CREAT|O_EXCL lock file under ``<path>__meta`` guarding every
    index MUTATION critical section: an append's publish+fingerprint
    advance, and the full read-stage-swap span of compact and rebalance
    (those two derive the rewritten cell contents from index reads, so
    the reads must see the same files the swap later replaces — staging
    outside the lock would let a concurrent append's files be merged
    twice or deleted). A crash while holding the lock leaves the lock
    file behind — the error message names it so an operator can remove
    it after verifying the index (see :func:`ivf_index_verify`).

    The lock file carries a small JSON payload (``host``, ``pid``,
    ``acquired_utc``) so contention errors and :func:`ivf_index_verify`
    can say WHO holds it — the post-mortem question after a crash is
    "is that writer's process still alive on that host", and an empty
    lock file cannot answer it. NOTE the O_EXCL guarantee is
    per-filesystem: two drivers mounting DIFFERENT filesystems at the
    same warehouse path (or an object-store mount faking O_EXCL) get
    split-brain — the filesystem contract in COVERAGE.md covers this."""

    def __init__(self, path: str):
        import os

        meta = f"{path}__meta"
        os.makedirs(meta, exist_ok=True)
        self._lock = os.path.join(meta, "append.lock")

    def __enter__(self):
        import json
        import os
        import socket
        import time

        try:
            fd = os.open(self._lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            holder = _read_lock_holder(self._lock)
            held_by = (
                # .get defaults: _read_lock_holder accepts hand-written /
                # older-version payloads that carry host+pid only
                f" (held by pid {holder['pid']} on {holder['host']} "
                f"since {holder.get('acquired_utc', 'unknown time')})"
                if holder
                else ""
            )
            raise ConcurrentIndexMutation(
                f"another append holds {self._lock}{held_by}; retry after "
                "it finishes (if its process died, run "
                "ivf_index_repair(break_lock=True) to audit and restore "
                "the index)"
            ) from None
        payload = {
            "host": socket.gethostname(),
            "pid": os.getpid(),
            "acquired_utc": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        }
        os.write(fd, json.dumps(payload).encode())
        os.close(fd)
        return self

    def __exit__(self, *exc):
        import os

        try:
            os.unlink(self._lock)
        except FileNotFoundError:
            pass
        return False


def build_ivf_index(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int = 50,
    max_centroids: int = 256,
    index_name: str = "ivf_index",
) -> str:
    """Build the stored IVF index: one assignment pass (broadcast
    centroids, max-cosine cell) written as parquet ``partitionBy(cell_id)``
    so probes prune to their cells. Alongside the cells, ``<path>__meta``
    persists (a) the FROZEN centroid set — appends and probes read it back
    instead of re-deriving from a possibly-drifted corpus — and (b) the
    corpus fingerprint that :func:`ivf_index_probe` checks so a stored
    index can never silently answer for a different corpus. Returns the
    index path.

    The whole (re)build runs under the single-writer lock: a rebuild
    overwrites cells, centroids, stats, and fingerprint in sequence, so
    racing it against an append/compact/rebalance would interleave their
    renames with the overwrite — rows present but uncounted, or counted
    but deleted. Like every other mutation, concurrency raises
    :class:`ConcurrentIndexMutation` instead."""
    import os

    spark = corpus.sparkSession
    _invalidate_fp_cache(spark)
    path = _ivf_index_path(spark, index_name)
    # captured BEFORE the overwrite below recreates the data dir: a
    # REBUILD (live data exists) carries the append token forward; a
    # fresh build — including one where the operator deleted the data
    # dir to discard the token — must not (checking only the
    # fingerprint file would mis-detect, since __meta is a SIBLING dir
    # that deleting the data dir leaves behind)
    is_rebuild = os.path.isdir(path)
    cents = _ivf_centroids(corpus, vec_col, id_col, centroid_mod, max_centroids)
    assigned = _ivf_assign(
        spread_small_input(corpus).select(
            F.col(id_col).alias("neighbor_id"),
            _as_double_name(vec_col).alias("cv"),
        ),
        cents,
        "neighbor_id",
        "cv",
        keep=1,
    ).withColumnRenamed("cent_id", "cell_id")
    with _index_write_lock(path):
        assigned.write.mode("overwrite").partitionBy("cell_id").parquet(path)
        cents.coalesce(1).write.mode("overwrite").parquet(
            f"{path}__meta/centroids"
        )
        # per-cell row counts AT BUILD TIME — the drift baseline
        # ivf_cell_skew_audit compares against (appends deliberately do not
        # touch this: growth since build IS the signal)
        (
            spark.read.parquet(path)
            .groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("rows_at_build"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{path}__meta/cell_stats")
        )
        fp = _corpus_fingerprint(corpus, id_col)
        # A REBUILD carries the previous append token forward: the
        # documented repair flow rebuilds from the FULL current corpus,
        # which already contains every tokened batch — dropping the token
        # here would re-open the replay window the token exists to close
        # (a replayed foreachBatch batch would re-append rows the rebuild
        # already holds, and the XOR fingerprint cannot see duplicates:
        # ids cancel back to an apparently-consistent value). Rebuilding
        # from a corpus that does NOT include the last tokened batch is
        # the one case this is wrong — there the operator deletes the
        # index DATA dir first, which makes this a fresh build
        # (is_rebuild was captured before the overwrite above).
        prior = _read_fingerprint_or_none(path) if is_rebuild else None
        if prior is not None and prior.get("last_token") is not None:
            fp["last_token"] = prior["last_token"]
        _write_fingerprint(path, fp)
    _BUILT_IVF_INDEXES.add(path)
    return path


def ivf_index_append(
    batch: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index_name: str = "ivf_index",
    compact_after_files: int | None = None,
    idempotency_token: str | int | None = None,
) -> str:
    """Incrementally maintain a stored IVF index: assign ONLY the new
    batch against the FROZEN stored centroid set and append the rows to
    their owning ``cell_id`` partition directories — the 100 TB shape
    where a daily embedding batch costs one batch-sized assignment pass,
    not a full-corpus rebuild. The stored fingerprint is advanced by XOR
    composition (count adds, id hashes XOR), so a subsequent
    :func:`ivf_index_probe` against base ∪ batch verifies clean. Centroids
    are deliberately NOT recomputed: cell membership of existing rows
    never changes, which is exactly what makes the append O(|batch|).

    Failure atomicity: the heavy Spark write lands in a STAGING dir next
    to the index; a job failure there leaves the index and fingerprint
    untouched (staging is swept). Only after the write commits are the
    part files renamed into their cell partitions and the fingerprint
    advanced — both under an O_EXCL lock (single-writer contract: a
    concurrent append raises :class:`ConcurrentIndexMutation`, never
    silently drops a batch from the fingerprint). Renames are same-
    filesystem metadata ops, so the residual crash window is the file
    moves themselves — :func:`ivf_index_verify` recomputes the
    fingerprint from index CONTENTS to audit/repair after such a crash.

    ``compact_after_files`` wires maintenance into the lifecycle: after
    the batch publishes (same lock span, so no second writer can slip
    between publish and compaction), any cell that has accreted more
    than that many files is compacted in place (the
    :func:`ivf_index_compact` machinery), so a daily append job never
    lets probe cost degrade into file-open overhead. A compaction
    failure at that point raises :class:`IndexMaintenanceError` — the
    batch IS published and must not be re-appended.

    ``idempotency_token`` makes the append exactly-once under
    at-least-once delivery (Structured Streaming's foreachBatch replays
    a micro-batch whose checkpoint didn't commit): the token is stored
    atomically WITH the fingerprint advance, and an append whose token
    equals the stored one is skipped as a duplicate delivery — the XOR
    fingerprint alone cannot catch replays, because duplicate ids
    XOR-cancel back to an apparently-consistent value. The token must
    identify the LOGICAL batch globally, not just within one run:
    namespace it by the identity scope of your batch ids (e.g.
    ``f"{checkpoint_location}:batch-{batch_id}"`` — a bare batch_id
    collides when a new checkpoint restarts ids at 0 against the same
    index and would silently drop that first real batch). A rebuild via
    :func:`build_ivf_index` from the full current corpus carries the
    stored token forward, so post-repair replays stay no-ops.

    ORDERING ASSUMPTION: only the MOST RECENT token is remembered
    (``last_token``), so replay detection covers exactly one batch of
    lookback — a re-delivery of an OLDER batch after a newer one landed
    (b0 replayed after b1) is NOT detected and re-appends b0's rows.
    That single-token contract is sufficient for the target producer,
    Structured Streaming's foreachBatch, which replays only the latest
    uncommitted batch and never re-delivers an already-committed one.
    A hand-rolled caller with CONCURRENT or out-of-order producers must
    serialize batches itself (or keep its own applied-token ledger) —
    the token is a replay guard, not a general dedup log
    (tests/test_similarity.py pins this limitation explicitly)."""
    import glob
    import os
    import shutil
    import uuid

    spark = batch.sparkSession
    # the caller's corpus is moving (that's why it's appending): drop this
    # session's memoized corpus fingerprints so a later cached probe can't
    # compare against a pre-append fingerprint (ADVICE r8: the plan hash
    # can't see file-level growth behind the same corpus plan)
    _invalidate_fp_cache(spark)
    path = _ivf_index_path(spark, index_name)
    if idempotency_token is not None:
        # unlocked FAST PATH for the feature's target case: a replayed
        # delivery should not pay the batch-sized assignment + staged
        # parquet write just to be discarded at the locked check below
        # (which stays — this read is advisory, the locked one decides).
        # The data-dir check keeps the skip honest: a stale fingerprint
        # surviving next to a deleted index must not declare the replay
        # served
        fp = _read_fingerprint_or_none(path)
        if (
            fp is not None
            and fp.get("last_token") == idempotency_token
            and os.path.isdir(path)
        ):
            _BUILT_IVF_INDEXES.add(path)
            return path
    cents = spark.read.parquet(f"{path}__meta/centroids")
    cents_seen = _centroid_token(spark, path)
    assigned = _ivf_assign(
        spread_small_input(batch).select(
            F.col(id_col).alias("neighbor_id"),
            _as_double_name(vec_col).alias("cv"),
        ),
        cents,
        "neighbor_id",
        "cv",
        keep=1,
    ).withColumnRenamed("cent_id", "cell_id")
    staging = f"{path}__staging_{uuid.uuid4().hex}"
    try:
        assigned.write.mode("overwrite").partitionBy("cell_id").parquet(staging)
        add = _corpus_fingerprint(batch, id_col)
        # WRITE-AHEAD MANIFEST: everything :func:`ivf_index_repair` needs
        # to roll a crashed publish forward — the staged file list, the
        # batch's fingerprint delta, the token, and the centroid set the
        # assignment was computed against (a repair must discard the
        # staging if a rebalance swapped centroids before the crash).
        # Written BEFORE the lock/rename span so no crash window exists
        # between "files started moving" and "repair knows what moved"
        _write_append_manifest(staging, add, idempotency_token, cents_seen)
        with _index_write_lock(path):
            # the staged assignment is only valid against the centroid
            # set it was computed from — a rebalance that swapped the
            # centroids while we staged would make these cell ids stale
            if _centroid_token(spark, path) != cents_seen:
                raise ConcurrentIndexMutation(
                    f"centroid set of '{index_name}' changed while this "
                    "append was staging (a rebalance ran concurrently); "
                    "re-run the append against the refined centroids"
                )
            old = _read_fingerprint(path)
            if (
                idempotency_token is not None
                and old.get("last_token") == idempotency_token
            ):
                # duplicate delivery of an already-applied batch: skip
                # (the finally sweeps the staged copy); the index already
                # holds these rows and the fingerprint already counts them
                _BUILT_IVF_INDEXES.add(path)
                return path
            for cell_dir in glob.glob(os.path.join(staging, "cell_id=*")):
                dst_dir = os.path.join(path, os.path.basename(cell_dir))
                os.makedirs(dst_dir, exist_ok=True)
                for part in glob.glob(os.path.join(cell_dir, "*.parquet")):
                    os.rename(
                        part, os.path.join(dst_dir, os.path.basename(part))
                    )
            fp = {
                "rows": old["rows"] + add["rows"],
                "id_xor": old["id_xor"] ^ add["id_xor"],
            }
            # the token rides the SAME atomic write as the identity — a
            # separate file would reopen the replay window between them
            if idempotency_token is not None:
                fp["last_token"] = idempotency_token
            elif "last_token" in old:
                fp["last_token"] = old["last_token"]
            _write_fingerprint(path, fp)
            if compact_after_files is not None:
                try:
                    _compact_cells_locked(
                        spark, path, max_files_per_cell=compact_after_files
                    )
                except Exception as exc:
                    # Exception, not BaseException: a KeyboardInterrupt /
                    # SystemExit must propagate as itself, not be
                    # laundered into a catchable application error
                    raise IndexMaintenanceError(
                        f"auto-compaction of '{index_name}' failed AFTER "
                        "the batch was durably published and the "
                        "fingerprint advanced — do NOT retry the append "
                        "(it would silently duplicate the batch); retry "
                        "the compaction via ivf_index_compact"
                    ) from exc
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    _BUILT_IVF_INDEXES.add(path)
    return path


def ivf_index_verify(spark, index_name: str = "ivf_index") -> dict:
    """Recompute the corpus fingerprint from the INDEX CONTENTS (one
    id-column-pruned scan) and compare with the stored fingerprint — the
    audit/repair tool for a crash inside a mutation's publish window.
    Also checks REACHABILITY: every on-disk cell directory must be named
    by a live centroid, because the count+XOR fingerprint is
    layout-insensitive — a crash between a rebalance's data swap and its
    centroid swap leaves every row present (fingerprint clean) yet the
    split cells' rows in directories no probe is ever routed to. Also
    reports STALE ASIDES — the hidden ``.…old`` copies rebalance/compact
    rename originals to during a swap: a crash can leave them behind,
    where they hold duplicate (invisible) data forever and would
    otherwise never surface in any audit. Returns ``{"stored", "actual",
    "orphan_cells", "stale_asides", "lock_holder", "consistent"}``;
    callers finding ``consistent=False`` run :func:`ivf_index_repair`
    (automated restore-or-discard) or rebuild. ``lock_holder`` is the
    writer-lock payload ({host, pid, acquired_utc}) when a lock file
    exists, else None — diagnostic only (a LIVE writer's lock is normal,
    so it never flips ``consistent``); after a crash it answers the
    post-mortem question "whose lock is this, and is that process dead",
    which gates ``ivf_index_repair(break_lock=True)``."""
    import glob as _glob
    import os

    path = _ivf_index_path(spark, index_name)
    actual = _corpus_fingerprint(spark.read.parquet(path), "neighbor_id")
    stored = _read_fingerprint(path)
    stale = sorted(
        os.path.relpath(p, path)
        for p in _glob.glob(os.path.join(path, ".cell_id=*.old"))
        + _glob.glob(os.path.join(path, "cell_id=*", ".*.old"))
    )
    live = {
        int(r["cent_id"])
        for r in spark.read.parquet(f"{path}__meta/centroids")
        .select("cent_id")
        .collect()  # bounded: ≤ max_centroids rows
    }
    on_disk = {
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("cell_id=")
    }
    # on_disk ⊆ live is the invariant (a live centroid MAY own zero rows
    # after duplicate-vector tie-breaks, so live ⊆ on_disk is not)
    orphans = sorted(on_disk - live)
    return {
        "stored": stored,
        "actual": actual,
        "orphan_cells": orphans,
        "stale_asides": stale,
        "lock_holder": _read_lock_holder(
            os.path.join(f"{path}__meta", "append.lock")
        ),
        "consistent": (
            _fp_core(stored) == _fp_core(actual) and not orphans and not stale
        ),
    }


def ivf_index_repair(
    spark, index_name: str = "ivf_index", break_lock: bool = False
) -> dict:
    """Automated crash recovery for a stored IVF index — consumes the
    damage classes :func:`ivf_index_verify` reports (orphan cells, stale
    asides, fingerprint drift) and restores consistency under the writer
    lock, closing the loop that used to end at a manual runbook. Safe to
    run on a healthy index (no-op). Every decision is derived from
    durable on-disk state, never from guessing which files "look" staged:

    - **Crashed append** (staging dir with a write-ahead manifest): rolled
      FORWARD — the manifest lists exactly which part files belong to the
      batch, so the remaining moves complete, and the fingerprint advances
      by the manifest's batch delta (validated against a content
      recompute). A staging whose token already equals the stored token
      (crash after the fingerprint write) or whose centroid set was
      swapped while it staged is discarded instead; a manifest-LESS
      staging dir is a pre-publish crash — swept, the batch was never
      applied and re-delivery (the token's job) supplies it again.
    - **Crashed rebalance, not yet published** (parent asides whose cell
      id is still in the LIVE centroid set): rolled BACK — parents are
      restored from their asides (deleting any same-crash child that
      reused a split parent's id) and the orphaned child cells are
      removed after a fingerprint check proves the live-centroid cells
      alone already hold every fingerprinted row.
    - **Crashed rebalance, published** (parent asides whose id is NOT in
      the live centroid set): the children are canonical — the duplicate
      parent asides are discarded; a cell_stats baseline still naming
      dead cells is rolled forward from the crash's staged copy when one
      survives, else recomputed from current contents (baseline resets
      are reported in ``actions``).
    - **Crashed compaction** (in-cell ``.part….old`` asides): the asides
      are the pre-compaction originals. Live files whose rows are ALL
      contained in the asides are the landed half of the crashed rewrite
      and are deleted; disjoint live files are un-hidden originals and
      kept. Either way the asides are restored — the cell is
      byte-equivalent to before the compaction.
    - **Meta leftovers**: a missing live ``centroids``/``cell_stats`` dir
      is restored from its ``.old`` copy; completed-swap ``.old`` and
      staged ``.new`` residues are swept.

    ``break_lock=True`` removes a leftover writer lock first — pass it
    ONLY after confirming the crashed writer's process is dead (a live
    writer's lock must win; that is the single-writer contract).
    Returns ``{"actions": [...], **ivf_index_verify(...)}`` and raises
    :class:`IndexMaintenanceError` if consistency could not be restored
    (the remaining remedy is :func:`build_ivf_index` from the full
    current corpus, which carries the stored token forward)."""
    import glob
    import json
    import os
    import shutil
    import uuid

    path = _ivf_index_path(spark, index_name)
    meta = f"{path}__meta"
    actions: list[str] = []
    lock_file = os.path.join(meta, "append.lock")
    if break_lock and os.path.exists(lock_file):
        os.unlink(lock_file)
        actions.append("removed leftover writer lock (caller confirmed dead)")
    with _index_write_lock(path):
        # any repair invalidates this session's memoized fingerprints:
        # contents and/or the stored fingerprint may change below
        _invalidate_fp_cache(spark)

        # -- 1. live meta dirs: restore from .old if a swap died midway
        for name in ("centroids", "cell_stats"):
            live = os.path.join(meta, name)
            old = f"{live}.old"
            if not os.path.isdir(live) and os.path.isdir(old):
                os.rename(old, live)
                actions.append(f"restored __meta/{name} from its .old copy")
        if not os.path.isdir(os.path.join(meta, "centroids")):
            raise IndexMaintenanceError(
                f"index '{index_name}' has no centroid set and no .old "
                "copy to restore — rebuild via build_ivf_index"
            )

        live_ids = {
            int(r["cent_id"])
            for r in spark.read.parquet(f"{path}__meta/centroids")
            .select("cent_id")
            .collect()  # bounded: ≤ max_centroids rows
        }

        # -- 2. rebalance parent asides: roll back or discard by whether
        #       the centroid swap (the publish point) landed
        published_rebalance = False
        for aside in sorted(glob.glob(os.path.join(path, ".cell_id=*.old"))):
            cell = int(os.path.basename(aside)[len(".cell_id=") : -len(".old")])
            target = os.path.join(path, f"cell_id={cell}")
            if cell in live_ids:
                # centroids still name the parent: the rebalance never
                # became probe-visible — roll it back. A live dir with
                # this id can only be a same-crash child that reused a
                # split parent's id (the parent itself was renamed aside
                # first); its rows are duplicates of the parents' union
                if os.path.isdir(target):
                    shutil.rmtree(target)
                os.rename(aside, target)
                actions.append(f"restored split parent cell {cell} from aside")
            else:
                published_rebalance = True
                shutil.rmtree(aside)
                actions.append(
                    f"discarded duplicate parent aside of published "
                    f"rebalance (cell {cell})"
                )

        # -- 3. orphan cells (dirs no live centroid routes to): delete
        #       only if the live-centroid cells alone account for every
        #       fingerprinted row — otherwise deleting would lose data
        on_disk = {
            int(d.split("=", 1)[1])
            for d in os.listdir(path)
            if d.startswith("cell_id=")
        }
        orphans = sorted(on_disk - live_ids)
        if orphans:
            stored = _read_fingerprint(path)
            pruned_fp = _corpus_fingerprint(
                spark.read.parquet(path).where(
                    F.col("cell_id").cast("long").isin(sorted(live_ids))
                ),
                "neighbor_id",
            )
            if pruned_fp != _fp_core(stored):
                raise IndexMaintenanceError(
                    f"orphan cells {orphans} hold rows the fingerprint "
                    "counts (live cells alone do not reproduce it) — the "
                    "centroid swap is missing; rebuild via build_ivf_index"
                )
            for cell in orphans:
                shutil.rmtree(os.path.join(path, f"cell_id={cell}"))
            actions.append(f"removed duplicate orphan cells {orphans}")

        # -- 4. residue of a crashed REPAIR: step 5 stages asides into a
        #        visible sibling temp dir to read them; a repair killed
        #        mid-step would strand the ONLY copy of those rows there.
        #        Each temp dir carries a marker naming its cell, so the
        #        files are moved back as asides (pre-repair state) first
        for tmp in sorted(glob.glob(f"{path}__repair_*")):
            marker = os.path.join(tmp, ".cell_dir")
            if not os.path.isfile(marker):
                raise IndexMaintenanceError(
                    f"unmarked repair residue {tmp} — inspect manually "
                    "before re-running repair"
                )
            with open(marker) as fh:
                cell_dir = os.path.join(path, fh.read().strip())
            os.makedirs(cell_dir, exist_ok=True)
            moved_back = 0
            for p in glob.glob(os.path.join(tmp, "*.parquet")):
                os.rename(
                    p,
                    os.path.join(cell_dir, f".{os.path.basename(p)}.old"),
                )
                moved_back += 1
            shutil.rmtree(tmp)
            actions.append(
                f"recovered {moved_back} aside files from a crashed "
                f"earlier repair into {os.path.basename(cell_dir)}"
            )

        # -- 5. compaction asides: restore originals; drop live files the
        #        asides already contain (the landed half of the rewrite)
        for cell_dir in sorted(glob.glob(os.path.join(path, "cell_id=*"))):
            asides = sorted(glob.glob(os.path.join(cell_dir, ".*.old")))
            if not asides:
                continue
            # Spark's hidden-file filter skips dot-files even when named
            # explicitly, so stage the asides into a visible temp dir
            # (same-fs renames) to read them. The marker file makes this
            # span itself crash-recoverable (step 4); on any failure the
            # files move back to their aside names — never deleted
            tmp = f"{path}__repair_{uuid.uuid4().hex}"
            os.makedirs(tmp)
            with open(os.path.join(tmp, ".cell_dir"), "w") as fh:
                fh.write(os.path.basename(cell_dir))
            restore: list[tuple[str, str]] = []
            try:
                for a in asides:
                    orig = os.path.basename(a)[1 : -len(".old")]
                    os.rename(a, os.path.join(tmp, orig))
                    restore.append(
                        (os.path.join(tmp, orig), os.path.join(cell_dir, orig))
                    )
                live_parts = glob.glob(os.path.join(cell_dir, "*.parquet"))
                extra = 0
                if live_parts:
                    extra = (
                        spark.read.parquet(cell_dir)
                        .select("neighbor_id")
                        .join(
                            spark.read.parquet(tmp).select("neighbor_id"),
                            "neighbor_id",
                            "left_anti",
                        )
                        .count()
                    )
                if live_parts and extra == 0:
                    # every live row already exists in the asides: the
                    # live files are the crashed rewrite's landed output
                    for p in live_parts:
                        os.unlink(p)
                    actions.append(
                        f"dropped {len(live_parts)} landed rewrite files in "
                        f"{os.path.basename(cell_dir)}"
                    )
                for src, dst in restore:
                    os.rename(src, dst)
            except BaseException:
                # undo: staged asides back to their hidden names — the
                # temp dir must NEVER be deleted while it holds the only
                # copy of the cell's rows
                for src, _ in restore:
                    if os.path.exists(src):
                        os.rename(
                            src,
                            os.path.join(
                                cell_dir, f".{os.path.basename(src)}.old"
                            ),
                        )
                raise
            shutil.rmtree(tmp)
            actions.append(
                f"restored {len(restore)} pre-compaction originals in "
                f"{os.path.basename(cell_dir)}"
            )

        # -- 6. crashed appends: roll forward by manifest, sweep the rest.
        #       Runs AFTER the cell-level repairs above so the content
        #       validation below sees healthy cells (a coexisting
        #       compaction aside would otherwise make every roll-forward
        #       look fingerprint-inconsistent and force a rebuild)
        for staging in sorted(glob.glob(f"{path}__staging_*")):
            mpath = os.path.join(staging, "manifest.json")
            if not os.path.isfile(mpath):
                # pre-manifest crash (or a rebalance/compact staging):
                # nothing was published from it, and append batches are
                # re-delivered by the at-least-once producer
                shutil.rmtree(staging)
                actions.append(
                    f"swept manifest-less staging {os.path.basename(staging)}"
                )
                continue
            with open(mpath) as fh:
                manifest = json.load(fh)
            stored = _read_fingerprint(path)
            tok = manifest.get("token")
            if tok is not None and stored.get("last_token") == tok:
                # crash AFTER the fingerprint advance: batch fully applied
                shutil.rmtree(staging)
                actions.append(
                    f"discarded staging of already-applied batch {tok!r}"
                )
                continue
            if _centroid_token(spark, path) != manifest["centroid_token"]:
                shutil.rmtree(staging)
                actions.append(
                    "discarded staging assigned against a superseded "
                    "centroid set — re-deliver the batch"
                )
                continue
            for rel in manifest["files"]:
                src = os.path.join(staging, rel)
                dst = os.path.join(path, rel)
                if os.path.exists(src):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.rename(src, dst)
                elif not os.path.exists(dst):
                    raise IndexMaintenanceError(
                        f"append manifest names {rel} but it exists in "
                        "neither staging nor the index — cannot roll "
                        "forward; rebuild via build_ivf_index"
                    )
            expected = {
                "rows": stored["rows"] + manifest["batch_fp"]["rows"],
                "id_xor": stored["id_xor"] ^ manifest["batch_fp"]["id_xor"],
            }
            actual = _corpus_fingerprint(spark.read.parquet(path), "neighbor_id")
            if actual == _fp_core(stored):
                # a token-LESS append that crashed after its fingerprint
                # write: contents already match the stored fingerprint, so
                # the batch is fully applied — advancing again would
                # double-count it
                shutil.rmtree(staging)
                actions.append(
                    "discarded staging of already-applied token-less batch"
                )
                continue
            if actual != expected:
                raise IndexMaintenanceError(
                    "rolled-forward contents match neither the pre- nor "
                    f"post-append fingerprint (actual {actual}, expected "
                    f"{expected}) — rebuild via build_ivf_index"
                )
            if tok is not None:
                expected["last_token"] = tok
            elif "last_token" in stored:
                expected["last_token"] = stored["last_token"]
            _write_fingerprint(path, expected)
            shutil.rmtree(staging)
            actions.append(
                f"rolled crashed append forward ({manifest['batch_fp']['rows']} "
                "rows; fingerprint advanced)"
            )


        # -- 7. cell_stats naming dead cells (stats swap died after the
        #       centroid swap): roll the crash's staged copy forward when
        #       exactly one survives and matches the live centroids, else
        #       recompute (which RESETS the drift baseline — reported)
        stats_path = os.path.join(meta, "cell_stats")
        stats_ids = {
            int(r["cell_id"])
            for r in spark.read.parquet(stats_path)
            .select(F.col("cell_id").cast("long").alias("cell_id"))
            .collect()  # bounded: ≤ max_centroids rows
        }
        if published_rebalance or not stats_ids <= live_ids:
            staged = glob.glob(os.path.join(meta, ".cell_stats.*.new"))
            rolled = False
            if len(staged) == 1:
                staged_ids = {
                    int(r["cell_id"])
                    for r in spark.read.parquet(staged[0])
                    .select(F.col("cell_id").cast("long").alias("cell_id"))
                    .collect()  # bounded: ≤ max_centroids rows
                }
                if staged_ids <= live_ids:
                    bak = f"{stats_path}.old"
                    shutil.rmtree(bak, ignore_errors=True)
                    os.rename(stats_path, bak)
                    os.rename(staged[0], stats_path)
                    shutil.rmtree(bak)
                    actions.append("rolled staged cell_stats forward")
                    rolled = True
            if not rolled and not stats_ids <= live_ids:
                new_dir = os.path.join(meta, f".cell_stats.{uuid.uuid4().hex}.new")
                (
                    spark.read.parquet(path)
                    .groupBy(F.col("cell_id").cast("long").alias("cell_id"))
                    .agg(F.count(F.lit(1)).alias("rows_at_build"))
                    .coalesce(1)
                    .write.mode("overwrite")
                    .parquet(new_dir)
                )
                bak = f"{stats_path}.old"
                shutil.rmtree(bak, ignore_errors=True)
                os.rename(stats_path, bak)
                os.rename(new_dir, stats_path)
                shutil.rmtree(bak)
                actions.append(
                    "recomputed cell_stats from current contents (drift "
                    "baseline RESET to now)"
                )

        # -- 8. sweep completed-swap residues
        for leftover in glob.glob(os.path.join(meta, ".*.new")):
            shutil.rmtree(leftover)
            actions.append(f"swept staged meta dir {os.path.basename(leftover)}")
        for name in ("centroids", "cell_stats"):
            old = os.path.join(meta, f"{name}.old")
            if os.path.isdir(old) and os.path.isdir(os.path.join(meta, name)):
                shutil.rmtree(old)
                actions.append(f"swept superseded __meta/{name}.old")

    report = ivf_index_verify(spark, index_name)
    if not report["consistent"]:
        raise IndexMaintenanceError(
            f"repair of '{index_name}' could not restore consistency "
            f"(verify: {report}) — rebuild via build_ivf_index from the "
            "full current corpus (the stored token is carried forward)"
        )
    return {"actions": actions, **report}


def ivf_cell_skew_audit(spark, index_name: str = "ivf_index") -> DataFrame:
    """Per-cell drift report for a stored IVF index: current row count vs
    the count at build/rebalance time. Appends against FROZEN centroids
    never move existing rows, so a drifted batch distribution shows up as
    unbounded growth of a few hot cells — probe cost per cell rises and
    recall falls, and WITHOUT this audit nothing measures it. One
    column-pruned scan of the index (cell_id only — at 100 TB this reads
    parquet footers + one tiny shuffle of ≤``max_centroids`` groups)
    joined to the ≤256-row stored baseline.

    Columns: ``cell_id, rows_at_build, rows_now, added, growth`` (growth
    NULL for a cell born after build). Feed the hot cells to
    :func:`ivf_index_rebalance`."""
    path = _ivf_index_path(spark, index_name)
    # cell ids are LONG: after a rebalance the refined centroid ids are
    # arbitrary member vec_ids, so an int cast would wrap above 2^31
    now = (
        spark.read.parquet(path)
        .groupBy(F.col("cell_id").cast("long").alias("cell_id"))
        .agg(F.count(F.lit(1)).alias("rows_now"))
    )
    base = spark.read.parquet(f"{path}__meta/cell_stats").select(
        F.col("cell_id").cast("long").alias("cell_id"),
        F.col("rows_at_build").cast("long").alias("rows_at_build"),
    )
    # full_outer keeps cells that exist on only one side (born post-build /
    # emptied); no broadcast hint — unsupported for full outer, and both
    # sides are ≤ max_centroids rows anyway
    return (
        now.join(base, "cell_id", "full_outer")
        .select(
            "cell_id",
            F.coalesce("rows_at_build", F.lit(0)).alias("rows_at_build"),
            F.coalesce("rows_now", F.lit(0)).alias("rows_now"),
            (
                F.coalesce("rows_now", F.lit(0))
                - F.coalesce("rows_at_build", F.lit(0))
            ).alias("added"),
            F.round(
                F.coalesce(F.col("rows_now"), F.lit(0))
                / F.when(F.col("rows_at_build") > 0, F.col("rows_at_build")),
                4,
            ).alias("growth"),
        )
    )


def ivf_index_rebalance(
    spark,
    index_name: str = "ivf_index",
    cells: list[int] | None = None,
    factor: int = 2,
    growth_threshold: float = 2.0,
) -> list[int]:
    """Re-split oversized cells of a stored IVF index while leaving cold
    cells untouched — the drift-repair half of the serving lifecycle
    (build → append → audit → REBALANCE). Each listed cell is split into
    ``factor`` sub-cells: the sub-centroids are the cell's ``factor``
    smallest-id member VECTORS (deterministic, so the whole operation is
    DuckDB-replayable), every row of the cell is reassigned to its
    max-cosine sub-centroid, and the refined centroid set replaces the
    parent — future probes rank sub-cells individually, restoring
    per-cell probe cost and recall without touching any other partition.

    ``cells=None`` selects cells whose current rows exceed
    ``growth_threshold ×`` their build-time count (the audit's growth
    signal); a cell born AFTER build (``rows_at_build`` 0, growth NULL —
    infinite) qualifies whenever it holds rows. Cost is O(rows in the
    chosen cells) — the scan is partition-pruned to exactly those
    directories; the corpus fingerprint is unchanged (same rows, new
    layout). The ENTIRE read-stage-swap span runs under the single-writer
    lock (the staged reassignment must see the same cell files the swap
    later deletes — staging outside the lock would silently drop a
    concurrently-appended batch when the parent dir is removed); the
    publish step is file renames, with :func:`ivf_index_verify` as the
    post-crash audit. Returns the list of parent cell ids actually
    split."""
    import os

    from pyspark.sql import Window

    path = _ivf_index_path(spark, index_name)
    meta = f"{path}__meta"
    if cells is None:
        audit = ivf_cell_skew_audit(spark, index_name)
        cells = [
            int(r["cell_id"])
            for r in audit.where(
                (F.col("growth") >= growth_threshold)
                # growth is NULL for a cell born after build: its growth
                # is infinite, so any populated newborn cell qualifies —
                # a bare `NULL >= threshold` would silently drop exactly
                # the fastest-growing cells from auto-selection
                | (F.col("growth").isNull() & (F.col("rows_now") > 0))
            ).collect()  # bounded: ≤ max_centroids rows
        ]
    cells = sorted(int(c) for c in cells)
    if not cells:
        return []

    with _index_write_lock(path):
        all_cent_ids = {
            int(r["cent_id"])
            for r in spark.read.parquet(os.path.join(meta, "centroids"))
            .select("cent_id")
            .collect()  # bounded: ≤ max_centroids rows
        }
        # Sub-centroid ids must not collide with a SURVIVING centroid id
        # (a member row whose vec_id is also a kept centroid — possible
        # when duplicate-direction vectors tie-broke into a sibling cell
        # at build): a duplicate cent_id in the refined set would merge
        # two cells' files and double-score that centroid. Such rows stay
        # members but are excluded as sub-centroid CANDIDATES; a cell
        # left with no candidates is dropped from the split set (deleting
        # its dir with no sub-cells to land in would lose its rows).
        # Dropping a cell returns its centroid to the kept set, so
        # iterate to a fixpoint — ≤ |cells| tiny bounded passes, one in
        # practice.
        while True:
            kept_ids = sorted(all_cent_ids - set(cells))
            # partition-pruned scan of ONLY the cells being split
            sub_rows = (
                spark.read.parquet(path)
                .where(F.col("cell_id").isin(cells))
                .select(
                    F.col("cell_id").cast("long").alias("parent"),
                    "neighbor_id",
                    "cv",
                )
            )
            w = Window.partitionBy("parent").orderBy("neighbor_id")
            subcents = (
                sub_rows.where(~F.col("neighbor_id").isin(kept_ids))
                .withColumn("srk", F.row_number().over(w))
                .where(F.col("srk") <= factor)
                .select(
                    "parent",
                    F.col("neighbor_id").alias("sub_id"),
                    F.col("cv").alias("sub_v"),
                )
            )
            splittable = sorted(
                int(r["parent"])
                for r in subcents.select("parent").distinct().collect()
            )  # bounded: ≤ |cells| rows
            if splittable == cells:
                break
            cells = splittable
            if not cells:
                return []
        return _ivf_rebalance_locked(
            spark, path, meta, cells, sub_rows, subcents
        )


def _ivf_rebalance_locked(
    spark, path, meta, cells, sub_rows, subcents
) -> list[int]:
    """The stage-and-swap half of :func:`ivf_index_rebalance`; the caller
    holds the index write lock for the whole span."""
    import glob
    import os
    import shutil
    import uuid

    from pyspark.sql import Window

    scored = sub_rows.join(F.broadcast(subcents), "parent").select(
        "parent",
        "neighbor_id",
        "cv",
        "sub_id",
        (
            _dot(F.col("cv"), F.col("sub_v"))
            / (
                F.sqrt(_dot(F.col("cv"), F.col("cv")))
                * F.sqrt(_dot(F.col("sub_v"), F.col("sub_v")))
            )
        ).alias("sub_cos"),
    )
    wr = Window.partitionBy("parent", "neighbor_id").orderBy(
        F.col("sub_cos").desc(), F.col("sub_id")
    )
    assigned = (
        scored.withColumn("rrk", F.row_number().over(wr))
        .where(F.col("rrk") == 1)
        .select(F.col("sub_id").alias("cell_id"), "neighbor_id", "cv")
    )

    staging = f"{path}__staging_{uuid.uuid4().hex}"
    cents_new_dir = os.path.join(meta, f".centroids.{uuid.uuid4().hex}.new")
    stats_new_dir = os.path.join(meta, f".cell_stats.{uuid.uuid4().hex}.new")
    try:
        assigned.write.mode("overwrite").partitionBy("cell_id").parquet(staging)

        cents = spark.read.parquet(os.path.join(meta, "centroids"))
        refined = cents.where(~F.col("cent_id").isin(cells)).unionByName(
            subcents.select(
                F.col("sub_id").alias("cent_id"), F.col("sub_v").alias("cent_v")
            )
        )
        refined.coalesce(1).write.mode("overwrite").parquet(cents_new_dir)

        stats = spark.read.parquet(os.path.join(meta, "cell_stats"))
        child_stats = (
            spark.read.parquet(staging)
            .groupBy(F.col("cell_id").cast("long").alias("cell_id"))
            .agg(F.count(F.lit(1)).alias("rows_at_build"))
        )
        new_stats = (
            stats.where(~F.col("cell_id").cast("long").isin(cells))
            .select(
                F.col("cell_id").cast("long").alias("cell_id"),
                F.col("rows_at_build").cast("long").alias("rows_at_build"),
            )
            .unionByName(child_stats)
        )
        new_stats.coalesce(1).write.mode("overwrite").parquet(stats_new_dir)

        # Publish (caller holds the index write lock for this whole
        # span). The parents are RENAMED ASIDE — to a dot-prefixed name
        # Spark's hidden-file filter ignores — never deleted, until every
        # staged child and both meta swaps have landed: an exception
        # anywhere undoes the children and restores the parents, so the
        # original rows keep a live copy throughout (the staged children
        # hold the SAME rows re-bucketed, so deleting them on undo loses
        # nothing). The previous shape deleted parents first; a failure
        # in the child renames then hit the staging sweep in the finally
        # and destroyed the only remaining copy of the split cells' rows.
        moved_aside: list[str] = []  # original parent dir paths
        created_children: list[str] = []
        swapped: list[tuple[str, str]] = []  # (live meta dir, its .old copy)
        try:
            for cell in cells:
                src = os.path.join(path, f"cell_id={cell}")
                aside = os.path.join(path, f".cell_id={cell}.old")
                # a stale aside is crash residue that can hold the ONLY
                # copy of this cell's rows (death right after the
                # rename-aside, before any staged child landed) — refuse
                # loudly rather than delete it or fail with a bare
                # ENOTEMPTY; verify reports these as stale_asides
                if os.path.exists(aside):
                    raise RuntimeError(
                        f"stale aside {aside} exists — crash residue "
                        "that may hold the only copy of the cell's "
                        "rows; run ivf_index_repair before rebalancing"
                    )
                os.rename(src, aside)
                moved_aside.append(src)
            for cell_dir in glob.glob(os.path.join(staging, "cell_id=*")):
                dst_dir = os.path.join(path, os.path.basename(cell_dir))
                # unconditional, TRACKED create: a pre-existing dir here
                # can only be orphan crash residue (verify flags those);
                # renaming staged parts into an untracked live dir would
                # break the undo's byte-identical-restore guarantee, so
                # fail BEFORE anything moves and point at the repair
                try:
                    os.makedirs(dst_dir)
                except FileExistsError:
                    raise RuntimeError(
                        f"rebalance target {dst_dir} already exists — "
                        "orphan residue from a crashed mutation; run "
                        "ivf_index_verify and repair before rebalancing"
                    ) from None
                created_children.append(dst_dir)
                for part in glob.glob(os.path.join(cell_dir, "*.parquet")):
                    os.rename(
                        part, os.path.join(dst_dir, os.path.basename(part))
                    )
            for name, new_dir in (
                ("centroids", cents_new_dir),
                ("cell_stats", stats_new_dir),
            ):
                live = os.path.join(meta, name)
                old = f"{live}.old"
                shutil.rmtree(old, ignore_errors=True)
                os.rename(live, old)
                try:
                    os.rename(new_dir, live)
                except BaseException:
                    # restore the previous copy rather than leave NO
                    # live dir (the finally below would then delete the
                    # only new copy too); a process death between the
                    # two renames still leaves `<live>.old` on disk
                    os.rename(old, live)
                    raise
                swapped.append((live, old))
            # every swap landed: only now drop the previous meta copies
            # (dropping them per-swap would strand the FIRST swap in its
            # new state when the SECOND fails and the data dirs revert)
            for live, old in swapped:
                shutil.rmtree(old, ignore_errors=True)
        except BaseException:
            # undo in reverse: completed meta swaps back (their .old
            # copies still exist), then children (a sub-cell id may
            # reuse a split parent's id when that parent tie-broke a
            # member into a sibling cell), then the parents into place
            for live, old in swapped:
                if os.path.isdir(old):
                    shutil.rmtree(live, ignore_errors=True)
                    os.rename(old, live)
            for d in created_children:
                shutil.rmtree(d, ignore_errors=True)
            for src in moved_aside:
                aside = os.path.join(path, f".{os.path.basename(src)}.old")
                if not os.path.exists(src) and os.path.isdir(aside):
                    os.rename(aside, src)
            raise
        for src in moved_aside:
            shutil.rmtree(
                os.path.join(path, f".{os.path.basename(src)}.old"),
                ignore_errors=True,
            )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(cents_new_dir, ignore_errors=True)
        shutil.rmtree(stats_new_dir, ignore_errors=True)
    return cells


def ivf_index_compact(
    spark,
    index_name: str = "ivf_index",
    max_files_per_cell: int = 1,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[int, int]:
    """Compact cell partitions that have accreted small files: every
    :func:`ivf_index_append` lands ≥1 new file per touched cell, so after
    N daily batches a probe opens N files per probed cell — at 100 TB
    scan cost becomes file-open/footer overhead, not bytes. Cells whose
    file count exceeds ``max_files_per_cell`` are rewritten (sized from
    measured bytes, like operators/compaction.compact) and swapped in;
    contents, fingerprint, and probe results are unchanged. The whole
    list-read-swap span holds the single-writer lock: the staged rewrite
    reads whatever files exist when the Spark job runs, so a concurrent
    append landing a file between the read and the swap would leave that
    file in place while its rows are ALSO in the rewrite — duplicated
    rows, which the lock turns into a :class:`ConcurrentIndexMutation`
    on the append side instead. Returns ``{cell_id: new_file_count}``
    for the compacted cells."""
    path = _ivf_index_path(spark, index_name)
    with _index_write_lock(path):
        return _compact_cells_locked(
            spark, path, max_files_per_cell, target_file_bytes
        )


def _compact_cells_locked(
    spark,
    path: str,
    max_files_per_cell: int = 1,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[int, int]:
    """The per-cell rewrite half of :func:`ivf_index_compact`; the caller
    holds the index write lock (``ivf_index_append`` runs this inside its
    own lock span so no second writer can slip between publish and
    compaction). Per cell, the original part files are RENAMED ASIDE to
    dot-prefixed names Spark ignores — never unlinked — until every
    staged replacement file has landed: an exception undoes the staged
    files and restores the originals, so the cell's rows keep a live
    copy throughout. (The previous shape unlinked originals first; a
    failure in the staged renames then hit the staging sweep and
    destroyed the only copy of the cell's rows.)"""
    import glob
    import math
    import os
    import shutil
    import uuid

    from .compaction import dataset_bytes

    done: dict[int, int] = {}
    for cell_dir in sorted(glob.glob(os.path.join(path, "cell_id=*"))):
        parts = glob.glob(os.path.join(cell_dir, "*.parquet"))
        if len(parts) <= max_files_per_cell:
            continue
        cell = int(os.path.basename(cell_dir).split("=", 1)[1])
        n_files = max(
            1, math.ceil(dataset_bytes(spark, cell_dir) / target_file_bytes)
        )
        staging = f"{path}__staging_{uuid.uuid4().hex}"
        hidden: list[tuple[str, str]] = []  # (original, aside)
        landed: list[str] = []
        try:
            (
                spark.read.parquet(cell_dir)
                .coalesce(n_files)
                .write.mode("overwrite")
                .parquet(staging)
            )
            try:
                for part in parts:
                    aside = os.path.join(
                        cell_dir, f".{os.path.basename(part)}.old"
                    )
                    # same refusal policy as rebalance: a stale aside is
                    # crash residue possibly holding the only copy of
                    # rows — rename-over-file would silently replace it
                    if os.path.exists(aside):
                        raise RuntimeError(
                            f"stale aside {aside} exists — crash residue; "
                            "run ivf_index_repair before compacting"
                        )
                    os.rename(part, aside)
                    hidden.append((part, aside))
                for part in glob.glob(os.path.join(staging, "*.parquet")):
                    dst = os.path.join(cell_dir, os.path.basename(part))
                    os.rename(part, dst)
                    landed.append(dst)
            except BaseException:
                # undo: staged files out, originals back — the cell is
                # byte-identical to before the call
                for dst in landed:
                    try:
                        os.unlink(dst)
                    except FileNotFoundError:
                        pass
                for part, aside in hidden:
                    if os.path.exists(aside) and not os.path.exists(part):
                        os.rename(aside, part)
                raise
            for _, aside in hidden:
                try:
                    os.unlink(aside)
                except FileNotFoundError:
                    pass
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        done[cell] = n_files
    return done


#: Per-session memo of corpus fingerprints, keyed by (applicationId,
#: analyzed-plan semantic hash): a probe loop re-verifying the same corpus
#: pays the fingerprint scan ONCE, not once per probe batch — at 100 TB a
#: per-probe full id scan would defeat the stored index. Plan-keyed, so it
#: assumes the corpus a plan denotes is immutable within the session (the
#: same contract the stored fingerprint itself rests on).
_CORPUS_FP_CACHE: dict[tuple, dict] = {}


def _corpus_fingerprint_cached(
    df: DataFrame, id_col: str, fresh: bool = False
) -> dict:
    key = (
        df.sparkSession.sparkContext.applicationId,
        df._jdf.queryExecution().analyzed().semanticHash(),
        id_col,
    )
    fp = None if fresh else _CORPUS_FP_CACHE.get(key)
    if fp is None:
        # a fresh recompute REPLACES the memo entry: later cached probes
        # of the same plan see the corrected fingerprint, not the stale one
        fp = _CORPUS_FP_CACHE[key] = _corpus_fingerprint(df, id_col)
    return fp


def _invalidate_fp_cache(spark) -> None:
    """Drop this session's memoized corpus fingerprints. Called by every
    index MUTATION entry point (build/append): a mutation is the signal
    that the caller's corpus is moving — e.g. a parquet directory that a
    batch was just appended to — and a plan's semantic hash does not see
    file-level growth, so a memoized fingerprint computed before the
    mutation would keep matching the PRE-mutation stored fingerprint and
    let a probe silently serve neighbors from a different corpus (the
    exact misuse the guard exists to catch)."""
    app = spark.sparkContext.applicationId
    for key in [k for k in _CORPUS_FP_CACHE if k[0] == app]:
        del _CORPUS_FP_CACHE[key]


def ivf_index_probe(
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 3,
    index_name: str = "ivf_index",
    expected_corpus: DataFrame | None = None,
    expected_fingerprint: dict | None = None,
    verify_fresh: bool = False,
) -> DataFrame:
    """Serve top-k from a stored IVF index: queries are assigned to their
    ``nprobe`` best cells against the FROZEN stored centroids, then joined
    to the index on the PARTITION column — Catalyst turns the broadcast
    join into dynamic partition pruning, so only nprobe·Q cell directories
    are listed and read (plan-gated in tests/test_plan_quality.py).

    ``expected_corpus`` is the misuse guard the bare ``rebuild=False``
    reuse used to lack: pass the corpus the caller BELIEVES the index
    serves and the stored fingerprint is compared (count + id-hash XOR,
    one column-pruned scan, MEMOIZED per session+corpus-plan so a probe
    loop pays it once); a mismatch raises instead of silently returning
    neighbors from a different corpus. The memo assumes the files a
    corpus plan reads are IMMUTABLE between probes — the same contract
    the stored fingerprint itself rests on; index mutations
    (build/append) invalidate the session's memo, but files changed
    OUTSIDE this module (a parquet dir that grew behind the same plan)
    are invisible to the plan hash — pass ``verify_fresh=True`` to
    recompute the fingerprint for this probe. Callers that persist their
    corpus fingerprint alongside the corpus can pass
    ``expected_fingerprint`` directly and skip the scan entirely — the
    zero-scan serving shape.

    READER EXCLUSION: probes take no lock, so a probe that overlaps a
    :func:`ivf_index_rebalance` / :func:`ivf_index_compact` publish
    window can list the index mid-swap (split parents renamed aside
    before their staged children land) and silently return top-k missing
    those cells' rows. The single-writer lock serializes WRITERS only —
    schedule probes and structural maintenance apart (maintenance
    windows), or route probes through a session that calls
    :func:`ivf_index_verify` after maintenance. Plain appends are safe
    to overlap: cell files are only ever ADDED, so a concurrent reader
    sees a consistent (possibly pre-append) corpus."""
    from pyspark.sql import Window

    spark = queries.sparkSession
    path = _ivf_index_path(spark, index_name)
    if expected_fingerprint is None and expected_corpus is not None:
        expected_fingerprint = _corpus_fingerprint_cached(
            expected_corpus, id_col, fresh=verify_fresh
        )
    if expected_fingerprint is not None:
        stored = _fp_core(_read_fingerprint(path))
        actual = _fp_core(expected_fingerprint)
        if stored != actual:
            raise ValueError(
                f"stored IVF index '{index_name}' does not match the corpus "
                f"being queried: index fingerprint {stored}, corpus "
                f"fingerprint {actual} — rebuild the index (or append the "
                "missing batch) instead of reusing it"
            )
    index = spark.read.parquet(path)
    cents = spark.read.parquet(f"{path}__meta/centroids")
    q = _ivf_assign(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double_name(vec_col).alias("qv")
        ),
        cents,
        "query_id",
        "qv",
        keep=nprobe,
    ).select(
        # match the index's INFERRED partition-column dtype (int while
        # dir values fit, long once rebalance installs vec_id-sized cell
        # ids): a fixed int cast would wrap ids above 2^31 and a
        # mismatched type would put a cast on the partition side of the
        # join, risking the dynamic-partition-pruning shape
        F.col("cent_id").cast(index.schema["cell_id"].dataType).alias("cell_id"),
        "query_id",
        "qv",
    )

    scored = (
        index.withColumn("_nc", _norm_col("cv"))
        .join(F.broadcast(q.withColumn("_nq", _norm_col("qv"))), "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_pre("qv", "cv", "_nq", "_nc").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rk").alias("rank"),
        )
    )


def ivf_partitioned_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    centroid_mod: int = 50,
    nprobe: int = 3,
    max_centroids: int = 256,
    index_name: str = "ivf_index",
    rebuild: bool = True,
) -> DataFrame:
    """:func:`ivf_topk` with the corpus side served from a STORED index —
    the shape SCALE.md promises for 100 TB: the cell assignment is written
    ONCE as parquet partitioned by ``cell_id``, and every probe reads only
    the probed cells via partition pruning instead of re-assigning (and
    re-scanning) the whole corpus per query batch.

    Build: one assignment pass (broadcast centroids, max-cosine cell) →
    ``partitionBy(cell_id)`` parquet under the session staging area (the
    heartbeat-swept per-application dir of
    sources/parquet.materialize_result). Probe: scan the index joined to
    the broadcast (query → nprobe cells) frame on the PARTITION column,
    which Catalyst turns into dynamic partition pruning — the scan's
    PartitionFilters carry a dynamicpruning expression, so only nprobe·Q
    cell directories are listed and read (plan-gated in
    tests/test_plan_quality.py). Results are row-identical to
    :func:`ivf_topk` (asserted in tests/test_similarity.py) and share its
    DuckDB oracle.

    ``rebuild=False`` reuses an index of the same ``index_name`` already
    built BY THIS SESSION (the path is applicationId-scoped, so a stale
    index from another session can never be picked up) — the amortized
    serving shape, where probes pay only the pruned scan. Reuse is
    fingerprint-VERIFIED: the stored index's corpus fingerprint must match
    the ``corpus`` argument or the probe raises, so a wrong ``index_name``
    produces an error, never a silently wrong answer. Incremental
    maintenance lives in :func:`ivf_index_append`.
    """
    import os

    spark = corpus.sparkSession
    path = _ivf_index_path(spark, index_name)
    freshly_built = False
    if rebuild or path not in _BUILT_IVF_INDEXES or not os.path.isdir(path):
        build_ivf_index(
            corpus, vec_col, id_col, centroid_mod, max_centroids, index_name
        )
        freshly_built = True
    return ivf_index_probe(
        queries,
        vec_col,
        id_col,
        k=k,
        nprobe=nprobe,
        index_name=index_name,
        expected_corpus=None if freshly_built else corpus,
    )


def lsh_plane_signs(num_planes: int, dim: int, seed: int = 7) -> list[list[int]]:
    """The deterministic ±1 Rademacher hyperplanes used by
    :func:`lsh_bucketed_topk`: sign d of plane p is the parity of
    md5(seed:p:d). Module-level so the DuckDB oracle builder
    (plans.llm_ops._lsh_oracle) embeds the SAME planes as literals."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16) % 2
            == 0
            else -1
            for d in range(dim)
        ]
        for p in range(num_planes)
    ]


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_planes: int = 8,
    seed: int = 7,
    dim: int | None = None,
    quantize_scale: int | None = None,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join, exact cosine inside buckets.

    Hyperplanes are deterministic ±1 Rademacher vectors derived from
    md5(seed:plane:dim) on the DRIVER at plan-build time and embedded as
    one flat array literal per plane — no driver-side randomness, and the
    projection is ``zip_with``+``aggregate`` over that literal, so the
    expression tree is O(num_planes) nodes regardless of embedding width
    (the previous per-dimension when-chain built num_planes·dim branches:
    8k+ nodes at dim=1024).

    ``quantize_scale`` (e.g. 10_000) makes the bucket keys cross-engine
    exact: each component is floored to an integer at that scale
    (``floor(v·scale)`` — BIGINT in both Spark and DuckDB) and the
    projection is an integer dot product with the ±1 planes, so the sign
    test has no float-summation-order hazard and the whole bucket
    assignment replays bit-identically in the DuckDB oracle. The sign can
    differ from the float path only when |projection| < dim/scale — for
    unit-ish embeddings a ~1e-3 sliver — and recall is unaffected on the
    fixture (tests/test_similarity.py). ``None`` keeps the float
    projection.

    ``dim`` is the embedding dimensionality; pass it explicitly to keep
    plan construction fully lazy. When omitted it is probed from the small
    query side (one driver-side row, clear error when empty).
    """
    from pyspark.sql import Window

    if dim is None:
        probe = queries.select(vec_col).head(1)
        if not probe:
            raise ValueError(
                "lsh_bucketed_topk: queries frame is empty and dim= was not "
                "given; pass dim=<embedding dimensionality> explicitly"
            )
        dim = len(probe[0][0])

    planes = lsh_plane_signs(num_planes, dim, seed)

    def bucket_bits(vname: str) -> Column:
        # ONE parsed expression for the whole key (r15): the per-plane
        # F.array(64 lits) + zip_with/aggregate lambdas cost hundreds of
        # py4j round-trips per call site — the parser builds the identical
        # tree (same ±1 literals, same fold) from a single string.
        bits = []
        for signs in planes:
            arr = ", ".join(str(s) for s in signs)
            if quantize_scale is not None:
                s = (
                    f"aggregate(zip_with(`{vname}`, array({arr}), "
                    f"(x, wi) -> floor(x * {quantize_scale}) * wi), "
                    "CAST(0 AS BIGINT), (acc, t) -> acc + t)"
                )
            else:
                arr = ", ".join(f"{float(s)}D" for s in signs)
                s = (
                    f"aggregate(zip_with(`{vname}`, array({arr}), "
                    "(x, wi) -> x * wi), 0.0D, (acc, t) -> acc + t)"
                )
            bits.append(f"CASE WHEN {s} > 0 THEN '1' ELSE '0' END")
        return F.expr("concat(" + ", ".join(bits) + ")")

    # fail fast on a dim mismatch: zip_with null-pads the shorter side,
    # which would silently collapse every bucket key to all-zero bits
    # (LSH degrades to one giant bucket) instead of erroring
    def checked(vcol: Column) -> Column:
        return F.assert_true(
            F.size(vcol) == dim,
            F.lit(f"lsh_bucketed_topk: embedding dim != configured dim={dim}"),
        ).isNull()  # assert_true returns NULL; fold it into a no-op filter

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double_name(vec_col).alias("qv"),
        )
        .where(checked(F.col("qv")))
        .withColumn("bucket", bucket_bits("qv"))
    )
    c = (
        spread_small_input(corpus)
        .select(
            F.col(id_col).alias("neighbor_id"),
            _as_double_name(vec_col).alias("cv"),
        )
        .where(checked(F.col("cv")))
        .withColumn("bucket", bucket_bits("cv"))
    )

    scored = (
        c.withColumn("_nc", _norm_col("cv"))
        .join(F.broadcast(q.withColumn("_nq", _norm_col("qv"))), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_pre("qv", "cv", "_nq", "_nc").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rk").alias("rank"),
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_subspaces: int = 4,
    centroid_mod: int = 25,
    dim: int | None = None,
    max_codebook: int = 256,
) -> DataFrame:
    """Approximate top-k by product quantization with asymmetric distance.

    The memory-compression scale path the other ANN variants don't cover:
    each corpus vector is stored as ``num_subspaces`` small centroid codes
    (bytes at scale, vs 4·dim floats), and queries never touch the raw
    corpus vectors again — candidate scoring is an equality join between
    the code table and a per-query lookup table of subspace distances
    (the classic ADC of Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011).

    Deterministic, driver-state-free codebook (same policy as
    :func:`ivf_topk`): the sub-vectors of corpus rows with
    ``id % centroid_mod == 0`` are the centroids of every subspace.

    Stages (all narrow or broadcast; the corpus is scanned ONCE to encode):
    1. encode — corpus × broadcast(centroids): per subspace ``m`` pick
       ``argmin`` squared-L2 of the sliced sub-vectors (``min_by`` over a
       (distance, centroid-id) struct — deterministic tie-break);
    2. LUT — queries × broadcast(centroids): exact sub-distance of every
       (query, centroid, subspace) — Q·C·num_subspaces tiny rows;
    3. ADC — explode codes to (corpus-id, m, code) and equality-join the
       broadcast LUT on (m, code), summing the ``num_subspaces`` partial
       distances per (query, corpus-id); top-k per query by a window.

    At 100 TB the code table (step 1's output) is the stored index; steps
    2-3 run per query batch against codes only. Returns (query_id,
    neighbor_id, adc_dist = approximate squared L2, rank).
    """
    from pyspark.sql import Window

    if dim is None:
        probe = queries.select(vec_col).head(1)
        if not probe:
            raise ValueError(
                "pq_topk: queries frame is empty and dim= was not given; "
                "pass dim=<embedding dimensionality> explicitly"
            )
        dim = len(probe[0][0])
    if dim % num_subspaces:
        raise ValueError(f"pq_topk: dim {dim} not divisible by {num_subspaces}")
    sub = dim // num_subspaces

    def subvec(col: Column, m: int) -> Column:
        return F.slice(col, m * sub + 1, sub)

    def sq_l2(a: Column, b: Column) -> Column:
        d = F.zip_with(a, b, lambda x, y: x - y)
        return _dot(d, d)

    # bounded codebook: the mod rule alone would grow the centroid count
    # with the corpus; the cap keeps encode cost O(N·max_codebook)
    cents = corpus.where(
        (F.col(id_col) % centroid_mod == 0)
        & (F.col(id_col) < centroid_mod * max_codebook)
    ).select(
        F.col(id_col).alias("cent_id"),
        *[
            subvec(_as_double_name(vec_col), m).alias(f"cent_s{m}")
            for m in range(num_subspaces)
        ],
    )

    c = spread_small_input(corpus).select(
        F.col(id_col).alias("cid"),
        *[
            subvec(_as_double_name(vec_col), m).alias(f"s{m}")
            for m in range(num_subspaces)
        ],
    )
    codes = (
        c.crossJoin(F.broadcast(cents))
        .groupBy("cid")
        .agg(
            *[
                F.min_by(
                    "cent_id",
                    F.struct(
                        sq_l2(F.col(f"s{m}"), F.col(f"cent_s{m}")).alias("d"),
                        F.col("cent_id").alias("t"),
                    ),
                ).alias(f"code{m}")
                for m in range(num_subspaces)
            ]
        )
        .select(
            "cid",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"), F.col(f"code{m}").alias("code")
                        )
                        for m in range(num_subspaces)
                    ]
                )
            ).alias("mc"),
        )
        .select("cid", "mc.m", "mc.code")
    )

    lut = (
        queries.select(
            F.col(id_col).alias("query_id"),
            *[
                subvec(_as_double_name(vec_col), m).alias(f"q{m}")
                for m in range(num_subspaces)
            ],
        )
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            F.col("cent_id").alias("code"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            sq_l2(F.col(f"q{m}"), F.col(f"cent_s{m}")).alias("d"),
                        )
                        for m in range(num_subspaces)
                    ]
                )
            ).alias("md"),
        )
        .select("query_id", "code", "md.m", "md.d")
    )

    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("query_id", F.col("cid").alias("neighbor_id"))
        # rank on the ROUNDED distance: corpus vectors sharing a code
        # tuple have mathematically equal ADC sums, but float summation
        # order (across engines AND across partition orders run-to-run)
        # leaves them ulps apart — ranking raw sums tie-breaks
        # nondeterministically
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id")
    )
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "adc_dist",
            F.col("rk").alias("rank"),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    coarse_mod: int = 50,
    nprobe: int = 3,
    num_subspaces: int = 4,
    pq_mod: int = 25,
    dim: int | None = None,
    max_centroids: int = 256,
) -> DataFrame:
    """IVFADC — the combined IVF + PQ index of Jégou et al. (TPAMI 2011
    §IV): a coarse quantizer routes each vector to an inverted-list cell,
    and product quantization encodes the RESIDUAL (vector − cell
    centroid), which is far lower-energy than the raw vector and so
    quantizes more accurately at the same code budget. This is the shape
    billion-scale libraries (FAISS IVFx,PQy) actually deploy: at 100 TB
    the stored index is (cell id + num_subspaces codes) per vector —
    bytes, not 4·dim floats — queries probe ``nprobe`` cells and score
    candidates with an ADC lookup-table join against codes only.

    Deterministic, driver-state-free quantizers (same policy as
    :func:`ivf_topk` / :func:`pq_topk`): coarse centroids are corpus
    vectors with ``id % coarse_mod == 0``; the residual-space PQ codebook
    is the residuals of corpus rows with ``id % pq_mod == 0``. Every
    argmin tie-breaks on the centroid id, so results are bit-stable and
    the whole pipeline — assignment, residuals, codes, LUT, ADC — replays
    exactly in the DuckDB oracle.

    Stages (all narrow or broadcast; one corpus scan to encode):
    1. coarse-assign corpus and queries by min squared-L2 (keep 1 /
       ``nprobe``), carrying the centroid vector for the residual;
    2. residual-encode the corpus against the broadcast PQ codebook
       (``min_by`` per subspace);
    3. per-query LUT: sub-distances of the query's PER-CELL residual to
       every codebook entry — (cell, m, code) keyed, Q·nprobe·C·m rows;
    4. ADC equality join codes ⋈ LUT on (cell, m, code), sum partials,
       window top-k.
    """
    from pyspark.sql import Window

    if dim is None:
        probe = queries.select(vec_col).head(1)
        if not probe:
            raise ValueError(
                "ivfpq_topk: queries frame is empty and dim= was not given; "
                "pass dim=<embedding dimensionality> explicitly"
            )
        dim = len(probe[0][0])
    if dim % num_subspaces:
        raise ValueError(f"ivfpq_topk: dim {dim} not divisible by {num_subspaces}")
    sub = dim // num_subspaces

    # both quantizer sets are CAPPED: a mod rule alone grows the centroid
    # count with the corpus, turning one-pass assignment into O(N^2/mod)
    cents = corpus.where(
        (F.col(id_col) % coarse_mod == 0)
        & (F.col(id_col) < coarse_mod * max_centroids)
    ).select(
        F.col(id_col).alias("cell"), _as_double_name(vec_col).alias("cell_v")
    )

    def coarse_assign(df: DataFrame, side_id: str, side_vec: str, keep: int) -> DataFrame:
        d = F.zip_with(F.col(side_vec), F.col("cell_v"), lambda x, y: x - y)
        scored = df.crossJoin(F.broadcast(cents)).select(
            side_id,
            side_vec,
            "cell",
            "cell_v",
            _dot(d, d).alias("cell_d2"),
        )
        if keep == 1:
            # argmin, not top-n: min_by hash aggregate map-side-combines
            # each id's max_centroids candidates to one row BEFORE the
            # exchange (same shuffle cut as _ivf_assign's keep=1 path);
            # key struct (d2, cell) matches the window tie-break exactly
            return (
                scored.groupBy(side_id)
                .agg(
                    F.min_by(
                        F.struct(F.col("cell"), F.col("cell_v"), F.col(side_vec)),
                        F.struct(
                            F.col("cell_d2").alias("d"), F.col("cell").alias("t")
                        ),
                    ).alias("_best")
                )
                .select(
                    side_id,
                    F.col(f"_best.{side_vec}").alias(side_vec),
                    F.col("_best.cell").alias("cell"),
                    F.col("_best.cell_v").alias("cell_v"),
                )
            )
        w = Window.partitionBy(side_id).orderBy(F.col("cell_d2").asc(), F.col("cell"))
        return (
            scored.withColumn("crk", F.row_number().over(w))
            .where(F.col("crk") <= keep)
            .drop("crk", "cell_d2")
        )

    def residual_slices(vec: str, prefix: str) -> list[Column]:
        r = F.zip_with(F.col(vec), F.col("cell_v"), lambda x, y: x - y)
        return [F.slice(r, m * sub + 1, sub).alias(f"{prefix}{m}") for m in range(num_subspaces)]

    def sq_l2(a: Column, b: Column) -> Column:
        d = F.zip_with(a, b, lambda x, y: x - y)
        return _dot(d, d)

    c_assigned = coarse_assign(
        spread_small_input(corpus).select(
            F.col(id_col).alias("cid"), _as_double_name(vec_col).alias("cv")
        ),
        "cid",
        "cv",
        keep=1,
    ).select("cid", "cell", *residual_slices("cv", "s"))

    # residual-space PQ codebook, shared across cells. Coarse-assigned
    # INDEPENDENTLY from the mod-filtered corpus rather than filtered out
    # of c_assigned: assignment is row-local against the broadcast cents,
    # so filter-then-assign is bit-identical to assign-then-filter — but
    # deriving it from c_assigned would recompute the full corpus
    # assignment (crossJoin + per-row window) a second time just to feed
    # the eager broadcast job, while this pass touches only the
    # ≤max_centroids codebook rows.
    pqcents = coarse_assign(
        corpus.where(
            (F.col(id_col) % pq_mod == 0)
            & (F.col(id_col) < pq_mod * max_centroids)
        ).select(
            F.col(id_col).alias("pq_id"), _as_double_name(vec_col).alias("pv")
        ),
        "pq_id",
        "pv",
        keep=1,
    ).select("pq_id", *residual_slices("pv", "pq_s"))

    codes = (
        c_assigned.crossJoin(F.broadcast(pqcents))
        .groupBy("cid", "cell")
        .agg(
            *[
                F.min_by(
                    "pq_id",
                    F.struct(
                        sq_l2(F.col(f"s{m}"), F.col(f"pq_s{m}")).alias("d"),
                        F.col("pq_id").alias("t"),
                    ),
                ).alias(f"code{m}")
                for m in range(num_subspaces)
            ]
        )
        .select(
            "cid",
            "cell",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(m).alias("m"), F.col(f"code{m}").alias("code"))
                        for m in range(num_subspaces)
                    ]
                )
            ).alias("mc"),
        )
        .select("cid", "cell", "mc.m", "mc.code")
    )

    q_assigned = coarse_assign(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double_name(vec_col).alias("qv")
        ),
        "query_id",
        "qv",
        keep=nprobe,
    ).select("query_id", "cell", *residual_slices("qv", "q"))

    lut = (
        q_assigned.crossJoin(F.broadcast(pqcents))
        .select(
            "query_id",
            "cell",
            F.col("pq_id").alias("code"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            sq_l2(F.col(f"q{m}"), F.col(f"pq_s{m}")).alias("d"),
                        )
                        for m in range(num_subspaces)
                    ]
                )
            ).alias("md"),
        )
        .select("query_id", "cell", "code", "md.m", "md.d")
    )

    adc = (
        codes.join(F.broadcast(lut), ["cell", "m", "code"])
        .groupBy("query_id", F.col("cid").alias("neighbor_id"))
        # rank on the ROUNDED distance: vectors sharing a code tuple have
        # mathematically equal ADC sums, but cross-engine float summation
        # order leaves them ulps apart — ranking on raw sums would
        # tie-break nondeterministically vs the oracle
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id")
    )
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "adc_dist",
            F.col("rk").alias("rank"),
        )
    )
