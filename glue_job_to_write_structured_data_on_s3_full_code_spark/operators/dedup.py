"""Deduplication operators for LLM-training-data pipelines (SURVEY.md §7 M5;
north star in BASELINE.json). Four tiers, cheapest first:

- :func:`exact_dedup` — hash-groupBy. One shuffle on a 128-bit digest,
  never on the payload. The 100 TB workhorse.
- :func:`jaccard_similar_pairs` — n-gram Jaccard via the *inverted-index
  join* (explode token → join on token → count co-occurrences), NOT
  pairwise array comparison: cost is Σ posting-list² per token within a
  blocking key, not N² over documents.
- :func:`simhash` — 32-bit SimHash fingerprint, pure SQL expressions
  (md5-nibble bit extraction) so the DuckDB oracle reproduces it exactly.
- :func:`minhash_lsh_candidates` — MinHash signatures + banded LSH. The
  scale path for fuzzy dedup: candidates come from equality joins on
  band keys (shuffle on band hash), verified with exact Jaccard only on
  the candidate set. The seeded family is md5-derived (one md5 per
  shingle, Carter-Wegman mixing) so DuckDB can replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text, tokens
from ..session import eager_checkpoint, spread_small_input

# Modulus of the MinHash universal-hash family: the Mersenne prime 2^31-1.
# Small enough that (a·u) with a, u < M stays under 2^62 — no 64-bit
# overflow in either Spark (silent wrap) or DuckDB (hard error).
MINHASH_MOD = (1 << 31) - 1


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int, int]]:
    """Deterministic Carter-Wegman coefficients (a_i, b_i, c_i) for the
    MinHash family h_i(u, v) = (a_i·u + b_i·v + c_i) mod 2^31-1, where
    (u, v) are two independent md5-derived 60-bit slices of the shingle
    reduced mod M. Plain integer literals on purpose: the DuckDB oracle
    embeds the SAME constants, making every signature (and hence every
    band key and candidate pair) bit-reproducible across engines."""
    coeffs = []
    for i in range(num_hashes):
        a = ((1103515245 * (i + 1) + 12345) % MINHASH_MOD) | 1
        b = ((2654435761 * (i + 1) + 1013904223) % MINHASH_MOD) | 1
        c = (i * 97 + 1) % MINHASH_MOD
        coeffs.append((a, b, c))
    return coeffs


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest id per identical (normalized) text. Returns the
    surviving ids + the digest and group size."""
    return (
        df.select(
            F.col(id_col),
            F.md5(normalized_text(text_col)).alias("digest"),
        )
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    # token-set dedup is per-document, and id_col is one row per document,
    # so array_distinct before the explode does it row-locally — a
    # cross-row .distinct() here would buy the same result with a full
    # shuffle of every (doc_id, token) pair
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(normalized_text(text_col)))).alias("tok"),
    )


def jaccard_similar_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str | None = None,
    threshold: float = 0.5,
    strategy: str = "postings",
) -> DataFrame:
    """Token-set Jaccard over an inverted-index self-join.

    ``block_col`` restricts candidate pairs to equal blocking keys (source,
    language, length bucket …) — at 100 TB you never run this unblocked.
    Hot tokens appearing in most docs of a block should additionally be
    dropped via a document-frequency cap; here the blocks are small enough
    that the posting-list join is exact and cheap.

    ``strategy`` picks the physical shape (identical results):

    - ``'postings'`` — inverted-index join; pair work is Σ df(token)² per
      block. The choice when blocks are large and token document
      frequencies are small (Zipf-tailed real corpora with a df cap).
    - ``'bitset'`` — per-block token→id dictionary, each doc's token set
      packed into an array<long> bitmask, block-local pair join scored
      with ``bit_count(a AND b)``. Pair work is B²·(vocab/64) words per
      block — the winner when blocks are bounded (≤ ~10k docs) and the
      per-block vocabulary is modest; measured 2.5× faster than postings
      on the dense-vocabulary fixture at sf0.1.
    - ``'arrow'`` — one shuffle (groupBy block) into ``applyInPandas``;
      each block is scored locally as a packed-bit numpy matrix
      (popcount via matmul of 0/1 rows). Tokenization stays Spark-side
      (identical normalization), only the intersection/size *counts*
      come back from Python, and the jaccard division + rounding +
      threshold run as JVM expressions so float behavior matches the
      other strategies exactly. Fastest when blocks are bounded: the
      whole pair loop is vectorized with zero per-pair plan overhead.
      Requires each block (docs × block vocabulary) to fit one task's
      memory — the same bound the bitset strategy carries.
    """
    if strategy == "bitset":
        return _jaccard_bitset_pairs(df, text_col, id_col, block_col, threshold)
    if strategy == "arrow":
        return _jaccard_arrow_pairs(df, text_col, id_col, block_col, threshold)
    # Build posting rows entirely map-side: the token set, its size, and
    # the blocking key are all row-local once array_distinct dedups within
    # the document, so no shuffle happens before the posting-list join
    # itself (the earlier agg-join formulation scanned the table 8×).
    base = [
        F.col(id_col).alias("doc_id"),
        F.array_distinct(tokens(normalized_text(text_col))).alias("toks"),
    ]
    if block_col is not None:
        base.append(F.col(block_col).alias("blk"))
    doc_tok = df.select(*base).select(
        "doc_id",
        *(["blk"] if block_col else []),
        F.size("toks").alias("n_tok"),
        F.explode("toks").alias("tok"),
    )

    # Length-ratio prefilter (exactness-preserving): jaccard(A,B) ≥ τ needs
    # |A∩B| ≥ τ·|A∪B| and |A∩B| ≤ min(|A|,|B|), hence min ≥ τ·max. Carrying
    # n_tok on each posting row lets the join kill over-ratio pairs before
    # the pair-count shuffle instead of after it.
    a = doc_tok.select(
        F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("n_a"), "tok",
        *(["blk"] if block_col else []),
    )
    b = doc_tok.select(
        F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("n_b"), "tok",
        *(["blk"] if block_col else []),
    )
    join_keys = ["tok", "blk"] if block_col else ["tok"]
    # n_a/n_b ride along as grouping keys (they are functionally dependent
    # on doc_a/doc_b), so the union-size denominator needs no join back to
    # `sizes` — that saves two shuffle joins and a re-tokenization pass.
    co = (
        a.join(b, join_keys)
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("n_a") >= threshold * F.col("n_b"))
            & (F.col("n_b") >= threshold * F.col("n_a"))
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        co.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _jaccard_bitset_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str | None,
    threshold: float,
) -> DataFrame:
    """Bitset-encoded block-pair Jaccard (see :func:`jaccard_similar_pairs`).

    Stages: (1) per-block vocabulary with dense ids (one distinct shuffle
    over (block, token), window per block — vocabulary rows, not posting
    rows); (2) posting join against the dictionary + groupBy doc to pack
    the array<long> mask (shuffles bounded by posting count); (3) the
    block-local pair join compares fixed-width masks with
    ``bit_count(x & y)`` — no string arrays cross the shuffle and the
    per-pair cost is a handful of word ops. Docs with an empty token set
    produce no posting rows and are excluded, matching the postings
    strategy and the oracle's ``WHERE normalized <> ''``.
    """
    from pyspark.sql import Window

    blk = F.col(block_col) if block_col is not None else F.lit("")
    d = df.select(
        F.col(id_col).alias("doc_id"),
        blk.alias("blk"),
        F.array_distinct(tokens(normalized_text(text_col))).alias("toks"),
    ).withColumn("n_tok", F.size("toks"))
    post = d.select("doc_id", "blk", "n_tok", F.explode("toks").alias("tok"))
    vocab = post.select("blk", "tok").distinct().withColumn(
        "tid", F.row_number().over(Window.partitionBy("blk").orderBy("tok")) - 1
    )
    vsize = vocab.groupBy("blk").agg(F.max("tid").alias("maxtid"))
    masked = (
        post.join(vocab, ["blk", "tok"])
        .groupBy("doc_id", "blk", "n_tok")
        .agg(F.collect_list("tid").alias("tids"))
        .join(F.broadcast(vsize), "blk")
        .withColumn("nwords", (F.col("maxtid") / 64 + 1).cast("int"))
        .withColumn(
            "mask",
            F.expr(
                "transform(sequence(0, nwords-1), w -> "
                "aggregate(filter(tids, t -> t div 64 = w), 0L, "
                "(acc,t) -> acc | shiftleft(1L, int(t % 64))))"
            ),
        )
        .select("doc_id", "blk", "n_tok", "mask")
    )
    a = masked.select(
        F.col("doc_id").alias("doc_a"), "blk",
        F.col("mask").alias("ma"), F.col("n_tok").alias("n_a"),
    )
    b = masked.select(
        F.col("doc_id").alias("doc_b"), "blk",
        F.col("mask").alias("mb"), F.col("n_tok").alias("n_b"),
    )
    pairs = (
        a.join(b, "blk")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("n_a") >= threshold * F.col("n_b"))
            & (F.col("n_b") >= threshold * F.col("n_a"))
        )
        .withColumn(
            "n_common",
            F.expr(
                "aggregate(zip_with(ma, mb, (x,y) -> bit_count(x & y)), 0, "
                "(acc,c) -> acc + c)"
            ),
        )
    )
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _jaccard_arrow_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str | None,
    threshold: float,
) -> DataFrame:
    """Arrow-vectorized block-pair Jaccard (see :func:`jaccard_similar_pairs`).

    One shuffle: ``groupBy(block)`` feeds ``applyInPandas``; inside the
    task the block's token sets become a 0/1 matrix and the full pairwise
    intersection count is one (row-chunked) matmul — numpy's BLAS path,
    no per-pair expression evaluation. Only integer counts leave Python;
    the jaccard ratio, rounding, and threshold run as JVM expressions so
    float/rounding semantics are bit-identical to the other strategies
    and the DuckDB oracle. Memory per task is O(block_docs × block_vocab)
    bits — the same per-block bound the bitset strategy documents.
    """
    import pandas as pd  # local import: operators module stays importable without pandas

    blk = F.col(block_col) if block_col is not None else F.lit("")
    d = df.select(
        F.col(id_col).alias("doc_id"),
        blk.alias("blk"),
        F.array_distinct(tokens(normalized_text(text_col))).alias("toks"),
    ).where(F.size("toks") > 0)
    if block_col is not None:
        # NULL-block docs never pair in the join strategies (equality on
        # blk drops nulls) but groupBy KEEPS the null group — pairing
        # them here would break the strategies' result-identity contract
        d = d.where(F.col("blk").isNotNull())

    # Loose prefilter only — the exact `round(jacc,6) >= threshold` runs
    # JVM-side below, so borderline pairs are decided by the same float
    # path in every strategy. Slack must cover the round-to-6-decimals
    # half-step (5e-7): a raw jaccard as low as threshold - 5e-7 still
    # rounds UP to pass the JVM filter, so a tighter slack (the old 1e-9)
    # dropped borderline pairs the other strategies keep.
    loose = threshold - 1e-6

    def score_block(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        n = len(pdf)
        out_cols = ("doc_a", "doc_b", "n_common", "n_a", "n_b")
        if n < 2:
            return pd.DataFrame({c: np.array([], dtype=np.int64) for c in out_cols})
        ids = pdf["doc_id"].to_numpy()
        sets = [set(t) for t in pdf["toks"]]
        vocab: dict[str, int] = {}
        for s in sets:
            for t in s:
                if t not in vocab:
                    vocab[t] = len(vocab)
        mat = np.zeros((n, len(vocab)), dtype=np.float32)
        for i, s in enumerate(sets):
            mat[i, [vocab[t] for t in s]] = 1.0
        sizes = mat.sum(axis=1).astype(np.int64)
        a_idx_all, b_idx_all, inter_all = [], [], []
        chunk = max(1, min(n, 8 * 1024 * 1024 // max(n, 1)))  # ~32MB f32 temp
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            inter = (mat[lo:hi] @ mat.T).astype(np.int64)  # chunk×n counts
            union = sizes[lo:hi, None] + sizes[None, :] - inter
            cand = (inter >= loose * union) & (
                np.arange(lo, hi)[:, None] < np.arange(n)[None, :]
            )
            ci, cj = np.nonzero(cand)
            a_idx_all.append(ci + lo)
            b_idx_all.append(cj)
            inter_all.append(inter[ci, cj])
        ai = np.concatenate(a_idx_all)
        bi = np.concatenate(b_idx_all)
        ia, ib = ids[ai], ids[bi]
        return pd.DataFrame(
            {
                "doc_a": np.minimum(ia, ib),
                "doc_b": np.maximum(ia, ib),
                "n_common": np.concatenate(inter_all),
                "n_a": sizes[ai],
                "n_b": sizes[bi],
            }
        )

    counts = d.groupBy("blk").applyInPandas(
        score_block,
        "doc_a long, doc_b long, n_common long, n_a long, n_b long",
    )
    return (
        counts.select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """32-bit SimHash as a bit string. Bit j of a token's hash is the high
    bit of hex nibble j of ``md5(token)`` — expressible identically in
    DuckDB, so the fingerprint itself is oracle-checkable. One explode +
    one groupBy; the 32 conditional sums are map-side combined."""
    if not 1 <= bits <= 32:
        # md5 hex has exactly 32 nibbles: substring past the end returns
        # '' (never a high nibble), so bits > 32 would SILENTLY emit
        # constant-'0' tail bits — fingerprints that look wider but carry
        # 32 bits of signal, inflating Hamming collisions
        raise ValueError(f"simhash: bits must be in [1, 32], got {bits}")
    # hoist md5 into one projection: inside 32 aggregate expressions it is
    # not subexpression-eliminated and would hash every token 32× (measured
    # 2.0 s → 1.1 s at sf0.1). Spread a single-partition scan so the
    # tokenize+hash map side is parallel (no-op on a partitioned scan).
    # The hex digest is then parsed ONCE into three bigints (conv of two
    # 15-nibble slices + the 2-nibble tail — 15 hex chars = 60 bits, safely
    # inside a signed 64-bit int, the same slicing minhash uses), so each
    # of the 32 per-bit aggregates is a shift+mask integer test instead of
    # a substring+isin over the string (r16: ~20% end-to-end at sf0.1,
    # bit-identical by tests/test_r16_optimizations.py). Bit j is the high
    # bit of hex nibble j: nibble >= 8 ⇔ hex char in 8..f — exact integer
    # equivalence with the oracle's substr/IN spelling.
    doc_tok = (
        _doc_tokens(spread_small_input(df), text_col, id_col)
        .withColumn("_h", F.md5(F.col("tok")))
        .withColumn(
            "_n1", F.expr("CAST(conv(substring(_h, 1, 15), 16, 10) AS BIGINT)")
        )
        .withColumn(
            "_n2", F.expr("CAST(conv(substring(_h, 16, 15), 16, 10) AS BIGINT)")
        )
        .withColumn(
            "_n3", F.expr("CAST(conv(substring(_h, 31, 2), 16, 10) AS BIGINT)")
        )
    )

    def _bit_high(j: int) -> str:
        # high bit of nibble j inside the three packed slices
        if j < 15:
            return f"(shiftright(_n1, {4 * (14 - j)}) & 8)"
        if j < 30:
            return f"(shiftright(_n2, {4 * (29 - j)}) & 8)"
        return f"(shiftright(_n3, {4 * (31 - j)}) & 8)"

    aggs = [
        F.expr(f"sum(CASE WHEN {_bit_high(j)} != 0 THEN 1 ELSE -1 END)").alias(
            f"s{j}"
        )
        for j in range(bits)
    ]
    sums = doc_tok.groupBy("doc_id").agg(*aggs)
    bit_cols = [F.when(F.col(f"s{j}") > 0, "1").otherwise("0") for j in range(bits)]
    return sums.select("doc_id", F.concat(*bit_cols).alias("simhash_bits"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
    verify_threshold: float = 0.5,
    hash_family: str = "md5cw",
) -> DataFrame:
    """Fuzzy-dup candidate pairs via MinHash + banded LSH, verified with
    exact shingle-set Jaccard on the candidates only.

    Pipeline (all narrow or equality-shuffle stages):
    1. word ``shingle_len``-shingles per doc (sliding window via
       ``F.transform`` over an index sequence — no UDF);
    2. ``num_hashes`` universal-hash values per shingle (Carter-Wegman
       ``(a·u + b·v + c) mod M`` over two 60-bit slices of the shingle
       hash), min per doc → signature (row-local ``array_min``; no
       explode, no groupBy);
    3. signature split into ``bands``; docs sharing any band key
       (md5 of the band's signature slice) are candidates (equality join
       on the band key — this is the step that makes it sub-quadratic at
       100 TB);
    4. exact Jaccard verification with an inverted-index join restricted
       to candidate pairs.

    ``hash_family`` picks the shingle→(u, v) base hash; the Carter-Wegman
    mixing, band keying, and exact verification are identical either way:

    - ``'md5cw'`` (default, the registered oracle mode) — (u, v) are two
      md5-derived 60-bit slices, ONE md5 per shingle, bit-reproducible in
      DuckDB so the driver gate replays the whole pipeline.
    - ``'xxhash64'`` — the production fast path: (u, v) are two seeded
      ``xxhash64`` values per shingle (JVM codegen'd, no hex parsing) —
      measured ~1.5× faster end-to-end at sf0.1. xxhash64 is
      Spark-specific, so this mode carries no cross-engine oracle; the
      exact-Jaccard verification step makes the FINAL pair set agree with
      'md5cw' whenever every true pair still shares ≥1 band
      (tests/test_dedup.py asserts equality on the fixture corpus).
    """
    # all pre-band work is row-local; a small fixture arrives as ONE scan
    # partition and would hash single-threaded, so spread it (no-op knob
    # when the scan is already partitioned, as at 100 TB)
    toks = spread_small_input(df).select(
        F.col(id_col).alias("doc_id"), tokens(normalized_text(text_col)).alias("ts")
    )
    gram = ", ".join(
        "ts[i]" if k == 0 else f"ts[i + {k}]" for k in range(shingle_len)
    )
    shingled = toks.select(
        "doc_id",
        F.expr(
            f"array_distinct(CASE WHEN size(ts) >= {shingle_len} THEN "
            f"transform(sequence(0, size(ts) - {shingle_len}), "
            f"i -> concat_ws(' ', {gram})) "
            "ELSE array(concat_ws(' ', ts)) END)"
        ).alias("shingles"),
    )

    # The whole signature is ROW-LOCAL: h_i(doc) = array_min(transform(uv,
    # p -> (a_i·u + b_i·v + c_i) mod M)) — no explode, no groupBy, no join.
    # The first shuffle in the entire operator is the band-key equality
    # join below; everything before it is map-side. md5 runs ONCE per
    # shingle (hoisted into the `uv` projection — inside num_hashes
    # lambdas it would not be subexpression-eliminated and would hash
    # every shingle 2·num_hashes times, the same hazard simhash() hit);
    # each family member is then two multiplies and a mod. Band keys hash
    # signature slices; emitting them with one array<struct> explode keeps
    # a single pass (not one select per band unioned).
    # Expression trees below are built as SQL strings parsed ONCE
    # (F.expr): the Column/lambda composition they replace is
    # value-identical but costs one py4j round-trip per sub-expression —
    # measured as a multi-second driver-side plan-construction tax per
    # invocation (r15; see operators/similarity._cosine_cols).
    M = MINHASH_MOD
    if hash_family == "xxhash64":
        # two seeded 64-bit hashes per shingle, reduced mod M (pmod:
        # xxhash64 is signed). No hex parsing, no md5 — pure codegen.
        uv = shingled.withColumn(
            "uv",
            F.expr(
                "transform(shingles, s -> named_struct("
                f"'u', pmod(xxhash64(s), {M}), "
                f"'v', pmod(xxhash64('v', s), {M})))"
            ),
        )
    elif hash_family == "md5cw":
        uv = shingled.withColumn(
            "_hex", F.expr("transform(shingles, s -> md5(s))")
        ).withColumn(
            "uv",
            F.expr(
                "transform(_hex, h -> named_struct("
                f"'u', CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT) % {M}, "
                f"'v', CAST(conv(substring(h, 16, 15), 16, 10) AS BIGINT) % {M}))"
            ),
        )
    else:
        raise ValueError(
            f"minhash_lsh_candidates: unknown hash_family {hash_family!r} "
            "(expected 'md5cw' or 'xxhash64')"
        )

    sig_cols = [
        F.expr(
            f"array_min(transform(uv, p -> "
            f"(({a} * p.u) % {M} + ({b} * p.v) % {M} + {c}) % {M}))"
        ).alias(f"h{i}")
        for i, (a, b, c) in enumerate(minhash_coeffs(num_hashes))
    ]
    sig = uv.select(
        "doc_id", "shingles", F.size("shingles").alias("n_sh"), *sig_cols
    )
    # Materialize the signature table ONCE before the band self-join (r15,
    # guide §2.4/§5): the join's two inputs are separate plan branches, so
    # without a lineage break the whole pre-band pipeline (tokenize →
    # shingle → md5 → 16 array_min signatures — the CPU-heavy map side)
    # executes TWICE, once per side (and the build side is collected for a
    # broadcast at small scale). Signature materialization is the standard
    # MinHash-at-scale shape (one corpus pass emits signatures, every
    # banding/join step reads the materialized frame); measured ~15%
    # end-to-end at sf0.1 with a bit-identical pair set.
    sig = eager_checkpoint(sig, "minhash_signatures")
    rows_per_band = num_hashes // bands
    band_entries = F.expr(
        "array("
        + ", ".join(
            "named_struct('band', {b}, 'band_key', md5(concat_ws(',', {hs})))".format(
                b=b,
                hs=", ".join(
                    f"h{b * rows_per_band + r}" for r in range(rows_per_band)
                ),
            )
            for b in range(bands)
        )
        + ")"
    )
    # carry the shingle set through the band join so verification needs no
    # extra join back to an exploded posting table: candidates are few by
    # construction, and array_intersect on the two carried sets is a
    # row-local exact check (no shuffle after the band join)
    banded = sig.select(
        "doc_id", "shingles", "n_sh", F.explode(band_entries).alias("bk")
    ).select("doc_id", "shingles", "n_sh", "bk.band", "bk.band_key")

    x = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"),
        F.col("n_sh").alias("n_a"), "band", "band_key",
    )
    y = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"),
        F.col("n_sh").alias("n_b"), "band", "band_key",
    )
    cand = (
        x.join(y, ["band", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        # a pair agreeing on several bands appears once per band; keep the
        # smallest band id so verification scores each pair exactly once
        .groupBy("doc_a", "doc_b")
        .agg(
            F.first("sh_a").alias("sh_a"), F.first("sh_b").alias("sh_b"),
            F.first("n_a").alias("n_a"), F.first("n_b").alias("n_b"),
        )
    )
    return (
        cand.withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= verify_threshold)
    )
