"""Similarity search over embedding columns (SURVEY.md §7 M5).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the query set,
  one pass over the corpus, per-query top-k via window. At 100 TB the
  corpus side stays partition-parallel and nothing shuffles except the
  (tiny) per-query candidate sets after local reduction.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane (sign) LSH
  assigns each vector a bucket key; queries probe only their own bucket,
  turning the N×Q cross product into an equality join. Recall is traded
  for cost; exactness is recovered per-bucket with true cosine.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM expressions, no
Python UDF. Embeddings are cast to double before arithmetic so results
match DuckDB's double math bit-for-bit (then rounded for the hash gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


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
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot(F.col("cv"), F.col("cv")))
                )
            ).alias("cosine"),
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


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_planes: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join, exact cosine inside buckets.

    Hyperplanes are generated deterministically from md5-seeded values per
    (plane, dimension) — no driver-side randomness, reproducible across
    runs and engines.
    """
    from pyspark.sql import Window

    dim_probe = len(corpus.select(vec_col).first()[0])

    def bucket_bits(vcol: Column) -> Column:
        bits = []
        for p in range(num_planes):
            # pseudo-random ±1 weights per (seed, plane, dim) from a hash bit
            terms = [
                F.when(
                    F.xxhash64(F.lit(seed), F.lit(p), F.lit(d)) % 2 == 0, vcol[d]
                ).otherwise(-vcol[d])
                for d in range(dim_probe)
            ]
            s = terms[0]
            for t in terms[1:]:
                s = s + t
            bits.append(F.when(s > 0, "1").otherwise("0"))
        return F.concat(*bits)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("bucket", bucket_bits(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", bucket_bits(F.col("cv")))

    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot(F.col("cv"), F.col("cv")))
                )
            ).alias("cosine"),
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
