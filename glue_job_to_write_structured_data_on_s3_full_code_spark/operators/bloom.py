"""Bloom-filter runtime pre-filtering for selective joins.

Spark's own runtime row-filter optimization (`spark.sql.optimizer.
runtime.bloomFilter.*`) injects exactly this shape when statistics
warrant; the internal `bloom_filter_agg` aggregate is not exposed as a
SQL-callable function in this build, so the operator materializes the
filter explicitly:

1. hash every build-side key to ``k`` bit positions (xxhash64, JVM),
2. OR them into an ``m``-bit bitset with a tiny groupBy (m/64 rows),
3. collect the bitset to the driver (a few hundred longs — this is the
   same "materialize the runtime filter, then reuse it" step Spark's
   optimizer performs as a subquery), and
4. probe it as a literal array expression on the big side BEFORE the
   join shuffle.

False positives are removed by the exact join that follows, so the
operator's result is bit-identical to the plain join — the Bloom pass
only cuts the probe side's shuffle volume. At 100 TB that's the point:
the fact table's shuffle shrinks by the filter's selectivity while the
plan stays a plain shuffled equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom_bits(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 15, k_hashes: int = 3
) -> list[int]:
    """Materialize the Bloom bitset for the (selective, bounded) build
    side: ``m_bits/64`` longs. One narrow explode + one tiny groupBy."""
    m_words = m_bits // 64
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    # seed cast long: xxhash64 hashes the input TYPE too,
                    # and the probe expression writes the seed as `{n}L`.
                    # The KEY is hashed through a string cast for the same
                    # reason: build and probe hash DIFFERENT columns, and
                    # xxhash64(1 as int) != xxhash64(1 as long) — an
                    # int/bigint key-type mismatch would silently fail
                    # every probe; the canonical string form is
                    # type-insensitive on both sides
                    F.pmod(
                        F.xxhash64(
                            F.lit(seed).cast("long"),
                            F.col(key_col).cast("string"),
                        ),
                        F.lit(m_bits),
                    )
                    for seed in range(k_hashes)
                ]
            )
        ).alias("p")
    )
    words = (
        pos.groupBy((F.col("p") / 64).cast("int").alias("w"))
        .agg(
            # SQL expr: the PySpark shiftleft wrapper only takes a literal
            # shift amount, the SQL function takes a column
            F.bit_or(F.expr("shiftleft(1L, cast(p % 64 as int))")).alias("bits")
        )
        .collect()
    )
    bitset = [0] * m_words
    for r in words:
        bitset[r["w"]] = r["bits"]
    return bitset


def bloom_might_contain(
    bitset: list[int], key_name: str, k_hashes: int = 3
) -> Column:
    """Probe predicate on the column named ``key_name``: every one of the
    k hashed bits is set. One SQL expression — the bitset array literal
    constant-folds, the per-row work is k hashes plus a few word ops, all
    inside whole-stage codegen. No UDF."""
    m_bits = len(bitset) * 64
    arr_sql = "array(" + ",".join(f"{w}L" for w in bitset) + ")"
    terms = []
    for seed in range(k_hashes):
        # string-cast to match build_bloom_bits' type-insensitive hashing
        p = f"pmod(xxhash64({seed}L, cast({key_name} as string)), {m_bits})"
        word = f"element_at({arr_sql}, cast({p} / 64 as int) + 1)"
        bit = f"shiftleft(1L, cast({p} % 64 as int))"
        terms.append(f"(({word} & {bit}) != 0)")
    return F.expr(" AND ".join(terms))


def bloom_prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    m_bits: int = 1 << 15,
    k_hashes: int = 3,
) -> DataFrame:
    """INNER equi-join with a Bloom pre-filter on the fact side. Result
    is bit-identical to ``fact.join(dim, fact[fact_key]==dim[dim_key])``
    — the filter only prunes probe rows before the shuffle; the exact
    join removes Bloom false positives.

    Inner (and the fact-preserving semi) joins are the ONLY types where
    pre-filtering the fact side is sound: under a left/full join the
    filter deletes exactly the rows the join should null-extend, and
    under an anti join it deletes exactly the rows the join should
    RETURN — both silently. Unsupported types raise.

    Key DTYPES must hash identically on both sides. The canonical
    string-cast makes the whole integer family safe (1 casts to "1" at
    every width), but across numeric families the string forms diverge
    while the exact join still matches under numeric coercion (int 1 vs
    double 1.0 → "1" vs "1.0"): every such row would be dropped by the
    Bloom pass and silently violate the bit-identical contract. Rather
    than guess a coercion (a double cast loses int64 precision above
    2^53), mixed-family keys raise — cast one side explicitly to the
    other's type first."""
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom_prefiltered_join: how={how!r} is unsound with a "
            "fact-side pre-filter (dropped rows would be null-extended "
            "or returned by the plain join); use a plain join"
        )
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    f_type = fact.schema[fact_key].dataType
    d_type = dim.schema[dim_key].dataType
    if f_type != d_type and not (
        isinstance(f_type, integral) and isinstance(d_type, integral)
    ):
        raise ValueError(
            f"bloom_prefiltered_join: fact key {fact_key!r} ({f_type.simpleString()}) "
            f"and dim key {dim_key!r} ({d_type.simpleString()}) are different "
            "numeric families — their canonical string forms hash differently "
            "while the exact join coerces them (e.g. 1 vs 1.0), so the Bloom "
            "pass would silently drop matching rows; cast one side to the "
            "other's type first"
        )
    bitset = build_bloom_bits(dim, dim_key, m_bits=m_bits, k_hashes=k_hashes)
    pre = fact.where(bloom_might_contain(bitset, fact_key, k_hashes=k_hashes))
    return pre.join(dim, pre[fact_key] == dim[dim_key], how)
