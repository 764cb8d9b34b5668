"""Behavioral / robust-statistics analytics pack (round 4): event
transition matrices, equi-depth histograms, and winsorized statistics —
the profiling shapes an analyst runs before modeling.

Design rules: integer-exact outputs (cents, counts, exact order
statistics — never interpolated percentiles, which are float-boundary
unstable cross-engine), deterministic tie-breaks on full key order.

Scale: every query is one or two hash/window shuffles; the windows are
partitioned by group key (no global sort except the bounded top-k
TakeOrdered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources import read_table


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence (lag window per user, one pair aggregation) — the
    path-analysis primitive behind funnels and next-action models.
    Top-20 transitions with deterministic tie-break."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count("*").alias("n_transitions"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    return pairs.orderBy(
        F.col("n_transitions").desc(), "prev_type", "next_type"
    ).limit(20)


EVENT_TRANSITION_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type,
       count(*) AS n_transitions, count(DISTINCT user_id) AS n_users
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
ORDER BY n_transitions DESC, prev_type, next_type
LIMIT 20
"""


def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH price histogram (10 buckets of equal row count via
    ntile over a fully deterministic order) — the distribution profile
    that equal-width bins miss on skewed data. Integer cents; bucket
    boundaries are exact order statistics, not interpolations.

    The exact-ntile form needs a GLOBAL ordering (single-task window —
    same documented trade as the W1 surrogate key, which ships a
    scalable twin): it runs post-profiling on bounded samples, and the
    100 TB variant derives boundaries from a deterministic sample and
    bins map-side against the broadcast cut list."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.orderBy("cents", "l_orderkey", "l_linenumber")
    return (
        li.withColumn("bucket", F.ntile(10).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("total_cents"),
        )
    )


EQUI_DEPTH_ORACLE = """
WITH b AS (
    SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
           ntile(10) OVER (ORDER BY CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
                           l_orderkey, l_linenumber) AS bucket
    FROM lineitem
)
SELECT bucket, count(*) AS n_rows, min(cents) AS min_cents,
       max(cents) AS max_cents, CAST(sum(cents) AS BIGINT) AS total_cents
FROM b GROUP BY bucket
"""


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-capped) statistics per return flag: values are
    clamped at the 10th-smallest and 10th-largest EXACT order statistics
    of their group (rank-based caps — interpolated percentiles would be
    float-unstable cross-engine), then aggregated in integer cents. Two
    partitioned rank windows + one aggregation."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    asc = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    desc = Window.partitionBy("l_returnflag").orderBy(
        F.col("cents").desc(), F.col("l_orderkey").desc(), F.col("l_linenumber").desc()
    )
    ranked = li.withColumn("rk_lo", F.row_number().over(asc)).withColumn(
        "rk_hi", F.row_number().over(desc)
    )
    caps = ranked.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("rk_lo") == 10, F.col("cents"))).alias("low_cap"),
        F.max(F.when(F.col("rk_hi") == 10, F.col("cents"))).alias("high_cap"),
    )
    clamped = ranked.join(F.broadcast(caps), "l_returnflag").withColumn(
        "wcents",
        F.greatest(F.least(F.col("cents"), F.col("high_cap")), F.col("low_cap")),
    )
    return clamped.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.min("low_cap").alias("low_cap"),
        F.min("high_cap").alias("high_cap"),
        F.sum("wcents").alias("winsorized_total"),
        ((F.sum("wcents") - F.pmod(F.sum("wcents"), F.count("*"))) / F.count("*"))
        .cast("long")
        .alias("winsorized_mean_floor"),
    )


WINSORIZED_ORACLE = """
WITH v AS (
    SELECT l_returnflag,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
           l_orderkey, l_linenumber
    FROM lineitem
), ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY cents, l_orderkey, l_linenumber) AS rk_lo,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY cents DESC, l_orderkey DESC,
                                       l_linenumber DESC) AS rk_hi
    FROM v
), caps AS (
    SELECT l_returnflag,
           max(CASE WHEN rk_lo = 10 THEN cents END) AS low_cap,
           max(CASE WHEN rk_hi = 10 THEN cents END) AS high_cap
    FROM ranked GROUP BY 1
), clamped AS (
    SELECT r.l_returnflag,
           greatest(least(r.cents, c.high_cap), c.low_cap) AS wcents,
           c.low_cap, c.high_cap
    FROM ranked r JOIN caps c USING (l_returnflag)
)
SELECT l_returnflag, count(*) AS n_rows,
       min(low_cap) AS low_cap, min(high_cap) AS high_cap,
       CAST(sum(wcents) AS BIGINT) AS winsorized_total,
       CAST((sum(wcents) - ((sum(wcents) % count(*) + count(*)) % count(*)))
            / count(*) AS BIGINT) AS winsorized_mean_floor
FROM clamped GROUP BY 1
"""


REGISTRY: list[tuple] = [
    ("event_transition_matrix", event_transition_matrix, EVENT_TRANSITION_ORACLE),
    ("equi_depth_histogram", equi_depth_histogram, EQUI_DEPTH_ORACLE),
    ("winsorized_stats", winsorized_stats, WINSORIZED_ORACLE),
]
