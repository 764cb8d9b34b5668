"""Skew-mitigating salted join.

At 100 TB a shuffled join on a key with hot values (the reference's dealer
codes — a handful of dealers own most leads) straggles: one reducer gets
the hot key's entire partition. AQE's skew-join splitting handles the
*sort-merge* case; salting is the general fix and also covers aggregations
and non-SMJ plans.

Construction: the fact side gets a deterministic per-row salt
(``xxhash64`` of all columns mod N — no RNG, replayable under task retry),
the dim side is exploded N ways, and the join key becomes
``(key, salt)``, spreading each hot key over N reducers. Result is
row-identical to the unsalted join; the test pins that equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on column ``on`` with the fact side salted
    into ``salt_buckets`` sub-keys. Supports the join modes where every
    fact row appears exactly once per dim match (inner/left)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # The salt mixes PER-ROW components (partition id + per-partition
    # counter), not just a hash of the row's columns: fully-duplicate
    # rows — key-only projections, dup-heavy event logs, i.e. exactly the
    # degenerate-skew inputs this operator exists for — would otherwise
    # all hash to ONE salt bucket and the hot key would still land on a
    # single reducer. Both components are deterministic per task, so a
    # retry re-derives the same salt.
    fact_salted = fact.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(
                F.spark_partition_id(),
                F.monotonically_increasing_id(),
                *[F.col(c) for c in fact.columns],
            ),
            F.lit(salt_buckets),
        ),
    )
    dim_exploded = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    return fact_salted.join(dim_exploded, [on, "_salt"], how).drop("_salt")
