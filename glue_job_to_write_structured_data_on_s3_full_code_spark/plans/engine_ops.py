"""Engine-primitive queries: MERGE upsert (full-row and column-subset),
Bloom-prefiltered join, and native session-window aggregation.

The reference's incremental load only INSERTS missing rows
(OUTBOUND.py:206-224); `merge_*` complete that into true upsert. The
Bloom query materializes the runtime-row-filter pattern Spark's optimizer
applies to selective joins (operators/bloom.py). Session windows exist in
the engine twice: the lag+cumsum batch shape (`events_sessionization`)
and the streaming stateful shape — this adds Spark's native
``session_window`` aggregate, whose merge semantics (gap measured from
the LAST event, strict <) the oracle reproduces as gaps-and-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import bloom_prefiltered_join
from ..operators.merge import merge_upsert, merge_upsert_columns
from ..session import tune
from ..sources import read_table

# Deterministic "delta" for the merge queries: low-key customers' orders
# arrive re-priced and re-flagged, plus synthetic new rows keyed above the
# fixture's range.
_DELTA_FILTER = "o_custkey < 100"


def _delta(orders: DataFrame) -> DataFrame:
    # the 10% price bump runs in EXACT decimal, not double: the stored
    # 2-dp prices hit exact .xx5 half-points after *1.1, where Spark
    # (round on the double's shortest repr) and DuckDB (round on the
    # double) disagree — 1 row in 151k at sf0.1, invisible at sf0.01
    # (caught by the round-6 sf0.1 parity sweep); decimal*decimal is
    # exact and both engines round decimal half-points identically
    bumped = F.round(
        F.col("o_totalprice").cast("decimal(27,6)")
        * F.lit("1.1").cast("decimal(2,1)"),
        2,
    ).cast("double")
    changed = orders.where(_DELTA_FILTER).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        bumped.alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    new_rows = orders.where(_DELTA_FILTER).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.lit(0.0).alias("o_totalprice"),
        "o_orderdate",
        F.lit("5-LOW").alias("o_orderpriority"),
    )
    return changed.unionByName(new_rows)


_DELTA_SQL = """
    SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
           CAST(round(CAST(o_totalprice AS DECIMAL(27,6))
                      * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
               AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_custkey < 100
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, 'N', 0.0,
           o_orderdate, '5-LOW'
    FROM orders WHERE o_custkey < 100
"""


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row MERGE: delta rows replace matched orders, new keys
    insert, untouched orders survive. One anti-join over the target."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    return merge_upsert(orders, _delta(orders), ["o_orderkey"])


MERGE_UPSERT_ORACLE = f"""
WITH delta AS ({_DELTA_SQL})
SELECT o.* FROM orders o
WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM delta)
UNION ALL
SELECT * FROM delta
"""


def merge_update_columns_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-subset MERGE: matched orders take (status, totalprice) from
    the delta and keep their other columns; delta-only keys insert with
    the non-updated columns null; everything else survives."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    return merge_upsert_columns(
        orders,
        _delta(orders),
        ["o_orderkey"],
        ["o_orderstatus", "o_totalprice"],
    )


MERGE_UPDATE_COLUMNS_ORACLE = f"""
WITH delta AS ({_DELTA_SQL})
-- match decided by the join key, not per-column coalesce: a matched
-- row takes the delta value even when it is NULL (UPDATE SET c = s.c),
-- mirroring operators/merge.merge_upsert_columns' _matched indicator
SELECT coalesce(o.o_orderkey, d.o_orderkey) AS o_orderkey,
       o.o_custkey,
       CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderstatus
            ELSE o.o_orderstatus END AS o_orderstatus,
       CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_totalprice
            ELSE o.o_totalprice END AS o_totalprice,
       o.o_orderdate,
       o.o_orderpriority
FROM orders o FULL OUTER JOIN delta d USING (o_orderkey)
"""


def bloom_prefiltered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of top-decile orders by priority, with the lineitem scan
    Bloom-prefiltered on the selective order-key set BEFORE the join
    shuffle. Result is bit-identical to the plain join (the exact join
    removes Bloom false positives) — the filter only cuts ~90% of the
    fact rows out of the shuffle."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    hi = read_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") >= 450000.0
    )
    joined = bloom_prefiltered_join(li, hi, "l_orderkey", "o_orderkey")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


BLOOM_REVENUE_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_lineitems,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_totalprice >= 450000.0
GROUP BY o_orderpriority
"""


def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window aggregate (30-min gap) per user:
    one groupBy, windows merged by the engine. window.end is
    last_event + gap — the oracle reproduces exactly that."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


# session_window merges an event into the current session iff
# ts - last_ts < gap (strict); window.end = last_ts + gap
SESSION_WINDOW_ORACLE = """
WITH g AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_num
    FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 6) AS session_value
FROM s
GROUP BY user_id, session_num
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigating salted join, driver-verified by construction: the
    salt spreads each (possibly hot) key over ``salt_buckets`` reducers
    but the RESULT is row-identical to the plain join, so the oracle is
    simply the unsalted SQL join. The plan pays one dim explosion (8×
    a broadcast-sized table) to remove the worst-reducer straggler at
    100 TB — AQE's skew splitting only rescues sort-merge plans; salting
    also covers hash joins and aggregations."""
    from ..operators.salted import salted_join

    tune(spark)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return salted_join(orders, cust, "c_custkey", "left", salt_buckets=8)


SKEW_SALTED_ORACLE = """
SELECT o.o_orderkey, o.o_custkey AS c_custkey, o.o_totalprice,
       c.c_name, c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


REGISTRY = [
    ("merge_upsert_orders", merge_upsert_orders, MERGE_UPSERT_ORACLE),
    (
        "merge_update_columns_orders",
        merge_update_columns_orders,
        MERGE_UPDATE_COLUMNS_ORACLE,
    ),
    ("bloom_prefiltered_revenue", bloom_prefiltered_revenue, BLOOM_REVENUE_ORACLE),
    ("skew_salted_join", skew_salted_join, SKEW_SALTED_ORACLE),
    (
        "events_session_window_native",
        events_session_window_native,
        SESSION_WINDOW_ORACLE,
    ),
]
