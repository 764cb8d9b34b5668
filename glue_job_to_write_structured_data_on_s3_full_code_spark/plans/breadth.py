"""Breadth queries — classic analytic shapes and function-family suites the
reference's capability surface implies but never spells out (SURVEY §2.5-2.8
"beyond" rows): scalable top-k, EXISTS-aggregation, window-min correlated
lookup, datetime/null/map function families, GROUPING SETS, and a
single-pass table profiler.

Scale notes are per-query in docstrings; every query here is pure JVM
expression (whole-stage codegen, no Python boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources import read_table


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join → per-order revenue →
    global top-10. The limit-after-total-order compiles to
    TakeOrderedAndProject — each partition keeps 10 rows, the driver merges
    k×partitions rows — the only global-sort shape that survives 100 TB.
    Tiebreak on l_orderkey makes the cut deterministic."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1997-06-01"))
    )
    li = read_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1997-06-01"))
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


TOP_UNSHIPPED_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       cast(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def order_priority_semi_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated subquery as a LEFT SEMI join with a
    non-equi residual (l_shipdate > o_orderdate), then a tiny-key count.
    Semi join never duplicates the probe side — no fanout to re-distinct."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORDER_PRIORITY_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def min_price_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated MIN subquery, re-expressed as a partitioned
    window min + self-filter — one shuffle on p_type instead of a
    per-row subquery; ties (several parts at the min) all survive,
    matching the correlated-IN semantics."""
    tune(spark)
    part = read_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("mn", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("mn"))
        .select("p_type", "p_partkey", "p_retailprice")
    )


MIN_PRICE_PART_ORACLE = """
SELECT p_type, p_partkey, p_retailprice
FROM (SELECT p_type, p_partkey, p_retailprice,
             min(p_retailprice) OVER (PARTITION BY p_type) AS mn
      FROM part) t
WHERE p_retailprice = mn
"""


def datetime_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family breadth: extract (year/month/quarter/day/iso-week),
    truncate, offset arithmetic, day-diff, month-end, epoch seconds, and
    the reference's hand-rolled UTC→IST shift (F9:
    ``from_unixtime(unix_timestamp(col) + 5*3600 + 30*60)``,
    FULL.py:215-216 — kept in its exact arithmetic form so the gate covers
    it after ``timezone_shift_format``'s r13 retirement).
    All codegen'd JVM expressions; epoch relies on the engine's pinned
    UTC session timezone (session.tune)."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.quarter(d).alias("qtr"),
        F.dayofmonth(d).alias("dom"),
        F.weekofyear(d).alias("iso_week"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d, 30).cast("timestamp").alias("plus_30d"),
        F.datediff(d, F.to_timestamp(F.lit("1995-01-01"))).alias("days_since_95"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.unix_timestamp(d).cast("bigint").alias("epoch_s"),
        F.from_unixtime(F.unix_timestamp(d) + 5 * 3600 + 30 * 60).alias("ist_ts"),
    )


DATETIME_SUITE_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate)                AS yr,
       month(o_orderdate)               AS mo,
       quarter(o_orderdate)             AS qtr,
       day(o_orderdate)                 AS dom,
       weekofyear(o_orderdate)          AS iso_week,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 30 DAY    AS plus_30d,
       datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       strftime(o_orderdate + INTERVAL 330 MINUTE, '%Y-%m-%d %H:%M:%S') AS ist_ts
FROM orders
"""


def null_handling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-combinator family: nullif, ifnull, nvl2, greatest/least
    (null-skipping per SQL semantics). Complements scalar_function_suite's
    coalesce/nullif defaults (reference F4, FULL.py:416-500)."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return cust.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.ifnull(seg_null, F.lit("(masked)")).alias("seg_masked"),
        F.expr(
            "nvl2(nullif(c_mktsegment,'BUILDING'), 'kept', 'masked')"
        ).alias("nvl2_tag"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap"),
    )


NULL_SUITE_ORACLE = """
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING')                        AS seg_or_null,
       ifnull(nullif(c_mktsegment, 'BUILDING'), '(masked)')    AS seg_masked,
       CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
            THEN 'kept' ELSE 'masked' END                      AS nvl2_tag,
       greatest(c_acctbal, 0.0)                                AS bal_floor,
       least(c_acctbal, 1000.0)                                AS bal_cap
FROM customer
"""


def map_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType family: create_map → transform_values (higher-order) →
    element_at, plus explode of the map into (key, value) rows — the
    map-side of the unpivot pattern. Generator runs inside codegen; output
    is 2 rows per lineitem with no shuffle at all."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"), F.lit("disc"), F.col("l_discount")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(
            F.transform_values(m, lambda _k, v: v * 2.0), F.lit("qty")
        ).alias("qty_doubled"),
        F.explode(m).alias("metric", "metric_value"),
    )


MAP_SUITE_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity * 2.0 AS qty_doubled,
       'qty' AS metric, l_quantity AS metric_value
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, l_quantity * 2.0, 'disc', l_discount
FROM lineitem
"""


def grouping_sets_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with a non-hierarchical set list ((a,b),(b),()) — not
    expressible as rollup/cube (those are registered separately). Spark
    expands to one aggregate over a grouping-id-expanded child: a single
    shuffle, not one job per set."""
    tune(spark)
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               cast(sum(cast(l_quantity AS decimal(27,6))) AS double) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        """
    )


GROUPING_SETS_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       cast(sum(cast(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-profiling operator: per-column rows / nulls /
    exact-distinct / min / max for the customer table, computed in ONE
    aggregate job (one scan, one 1-row shuffle) and pivoted to a row per
    column driver-side-free via explode(array(struct…)). The profiling
    twin of the reference's per-stage count audits (SURVEY §5.1) —
    at 100 TB swap countDistinct for approx_count_distinct."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer")
    num_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    str_cols = ["c_name", "c_mktsegment"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols + str_cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    one = cust.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"min_{c}").cast("double").alias("min_num"),
            F.col(f"max_{c}").cast("double").alias("max_num"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
        )
        for c in num_cols
    ] + [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            F.col(f"min_{c}").alias("min_str"),
            F.col(f"max_{c}").alias("max_str"),
        )
        for c in str_cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


_PROFILE_NUM = """
SELECT '{c}' AS column_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls, count(DISTINCT {c}) AS n_distinct,
       cast(min({c}) AS DOUBLE) AS min_num, cast(max({c}) AS DOUBLE) AS max_num,
       cast(NULL AS VARCHAR) AS min_str, cast(NULL AS VARCHAR) AS max_str
FROM customer
"""

_PROFILE_STR = """
SELECT '{c}' AS column_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls, count(DISTINCT {c}) AS n_distinct,
       cast(NULL AS DOUBLE) AS min_num, cast(NULL AS DOUBLE) AS max_num,
       min({c}) AS min_str, max({c}) AS max_str
FROM customer
"""

TABLE_PROFILE_ORACLE = " UNION ALL ".join(
    [_PROFILE_NUM.format(c=c) for c in ("c_custkey", "c_nationkey", "c_acctbal")]
    + [_PROFILE_STR.format(c=c) for c in ("c_name", "c_mktsegment")]
)


def grouped_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-list aggregation family: per-customer sorted list of
    order priorities, both as an array and as a delimited string.
    Sorting the collected array makes the output deterministic (bare
    collect_list order is partition-dependent) — the same rule the
    oracle's ORDER BY inside string_agg applies."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 500)
    sorted_list = F.array_sort(F.collect_list("o_orderpriority"))
    return orders.groupBy("o_custkey").agg(
        F.concat_ws(",", sorted_list).alias("priorities_csv"),
        F.element_at(sorted_list, 1).alias("first_priority"),
        F.element_at(sorted_list, -1).alias("last_priority"),
        F.size(F.array_distinct(sorted_list)).alias("n_distinct_priorities"),
        F.count("*").alias("n_orders"),
    )


# The collected array itself is projected to deterministic scalar forms
# (csv join / ends / distinct size) because the driver's oracle harness
# canonicalizes cells with pandas, which cannot hash list cells.
STRING_AGG_ORACLE = """
SELECT o_custkey,
       string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities_csv,
       min(o_orderpriority) AS first_priority,
       max(o_orderpriority) AS last_priority,
       cast(count(DISTINCT o_orderpriority) AS INTEGER) AS n_distinct_priorities,
       count(*) AS n_orders
FROM orders
WHERE o_custkey < 500
GROUP BY o_custkey
"""


def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension joined twice under different
    roles (supplier nation vs customer nation) with a symmetric pair
    filter, grouped by pair and year. Both nation sides broadcast; the
    fact pays one aggregation shuffle on the (pair, year) key."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,6)"
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair_ok)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


NATION_PAIR_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       cast(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
     OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
) t
GROUP BY supp_nation, cust_nation, l_year
"""


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic: the 10 heaviest o_custkey values with
    their share of all orders — what you run BEFORE picking salt factors or
    trusting AQE's skew-join split on a new key. Per-key counts shuffle
    once on the key; the scalar total is a broadcast cross join (never a
    global window, which would single-partition the aggregate)."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    total = per_key.agg(F.sum("n_orders").alias("tot"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            "n_orders",
            F.round(F.col("n_orders") * 1.0 / F.col("tot"), 9).alias("share"),
        )
        .orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
        .limit(10)
    )


KEY_SKEW_ORACLE = """
WITH c AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey),
     t AS (SELECT sum(n_orders) AS tot FROM c)
SELECT o_custkey, n_orders, round(n_orders * 1.0 / tot, 9) AS share
FROM c, t
ORDER BY n_orders DESC, o_custkey
LIMIT 10
"""


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math with an exact oracle (the ANN queries are rows-only, so
    this pins the dot-product/norm primitives they build on): L2 norm via
    higher-order aggregate, plus the first component scaled to unit norm.
    Pure codegen — at 100 TB this is a map-only pass; float32 inputs are
    upcast to double before squaring in BOTH engines so accumulation
    order can't drift the hash."""
    tune(spark)
    emb = read_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm = F.sqrt(sq_sum)
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(norm, 9).alias("l2_norm"),
        F.round(F.col("embedding")[0].cast("double") / norm, 9).alias("unit_first"),
    )


EMBEDDING_NORMS_ORACLE = """
SELECT vec_id, label,
       len(embedding) AS dim,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 9) AS l2_norm,
       round(CAST(embedding[1] AS DOUBLE)
             / sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 9) AS unit_first
FROM embeddings
"""


def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a ratio of conditional aggregates (one nation's
    revenue share of the region's total per year). The CASE sits inside
    the sum, so the share costs the same single agg shuffle as a plain
    sum — never two passes or a self-join. Fact tables (lineitem,
    orders, customer) shuffle-join; only nation/region broadcast —
    broadcasting a fact would OOM executors at 100 TB."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,6)"
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_8", vol).otherwise(F.lit(0).cast("decimal(27,6)"))).cast("double")
                / F.sum(vol).cast("double"),
                9,
            ).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
    )


MARKET_SHARE_ORACLE = """
SELECT year(o_orderdate) AS o_year,
       round(cast(sum(CASE WHEN n_name = 'NATION_8'
                      THEN cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                      ELSE cast(0 AS DECIMAL(27,6)) END) AS DOUBLE)
             / cast(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE), 9) AS mkt_share,
       cast(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS total_volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY year(o_orderdate)
"""


def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles/median per group — the exact twin of
    the sketch-based approx_distinct_stats. Exact percentile must gather
    each group's values (memory ∝ group size); at 100 TB use the KLL
    sketch path unless groups are provably bounded."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.median("l_extendedprice"), 6).alias("median_price"),
        F.round(F.percentile("l_quantity", 0.9), 6).alias("p90_qty"),
        F.round(F.percentile("l_discount", 0.25), 6).alias("p25_disc"),
        F.count("*").alias("n_rows"),
    )


EXACT_PERCENTILES_ORACLE = """
SELECT l_linestatus,
       round(median(l_extendedprice), 6)        AS median_price,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
       round(quantile_cont(l_discount, 0.25), 6) AS p25_disc,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_linestatus
"""


def correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / sample covariance / regression slope+
    intercept) per return flag — the multi-column moment aggregates the
    single-column stats suite doesn't touch. One partial-aggregable
    shuffle; moments merge associatively so map-side combine applies."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 9).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "covar_qty_price"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "slope_price_on_qty"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias(
            "intercept_price_on_qty"
        ),
        F.count("*").alias("n_rows"),
    )


CORRELATION_ORACLE = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 9)        AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 6)  AS covar_qty_price,
       round(regr_slope(l_extendedprice, l_quantity), 6)  AS slope_price_on_qty,
       round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept_price_on_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality gate as a first-class operator — the engine twin
    of the reference's runtime validation suite (SURVEY §5: count audits,
    column checks, reconciliation): one row per rule with its violation
    count, computed in a single pass over orders plus one broadcast
    anti-join for the referential rule."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    single = orders.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "v_key_null"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "v_price_range"
        ),
        F.sum(
            F.when(
                ~F.col("o_orderstatus").isin("O", "F", "P"), 1
            ).otherwise(0)
        ).alias("v_status_domain"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("v_key_dup"),
    )
    orphans = (
        orders.join(
            F.broadcast(cust.select("c_custkey")),
            orders.o_custkey == cust.c_custkey,
            "left_anti",
        )
        .agg(F.count("*").alias("v_orphan"))
    )
    single = single.crossJoin(orphans)
    rules = single.select(
        F.explode(
            F.array(
                F.struct(F.lit("orderkey_not_null").alias("rule"), F.col("v_key_null").cast("bigint").alias("violations")),
                F.struct(F.lit("orderkey_unique").alias("rule"), F.col("v_key_dup").cast("bigint").alias("violations")),
                F.struct(F.lit("totalprice_positive").alias("rule"), F.col("v_price_range").cast("bigint").alias("violations")),
                F.struct(F.lit("status_in_domain").alias("rule"), F.col("v_status_domain").cast("bigint").alias("violations")),
                F.struct(F.lit("custkey_references_customer").alias("rule"), F.col("v_orphan").cast("bigint").alias("violations")),
            )
        ).alias("r")
    ).select("r.*")
    return rules


DATA_QUALITY_ORACLE = """
SELECT 'orderkey_not_null' AS rule,
       count(*) FILTER (WHERE o_orderkey IS NULL) AS violations FROM orders
UNION ALL
SELECT 'orderkey_unique', count(*) - count(DISTINCT o_orderkey) FROM orders
UNION ALL
SELECT 'totalprice_positive', count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
UNION ALL
SELECT 'status_in_domain', count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) FROM orders
UNION ALL
SELECT 'custkey_references_customer', count(*) FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
"""


def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, via a
    LEFT OUTER join (customers with zero orders must appear) and two
    aggregations. The first groupBy is on c_custkey — the join key — so
    with AQE the aggregate reuses the join's shuffle; the second is on the
    tiny (order-count) domain."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.select("c_custkey")
        .join(orders.select("o_custkey", "o_orderkey"),
              cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


ORDER_COUNT_DIST_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
GROUP BY c_count
"""


def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no orders, grouped by market segment. The global average is a scalar
    aggregate broadcast into the filter (no second scan pays a shuffle);
    order-lessness is a null-safe LEFT ANTI join."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg(F.col("c_acctbal").cast("decimal(27,6)")).alias("avg_bal")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal").cast("decimal(27,6)") > F.col("avg_bal"))
    )
    idle = rich.join(
        orders.select("o_custkey"),
        rich.c_custkey == orders.o_custkey,
        "left_anti",
    )
    # sum in exact decimal, surface as double: a raw decimal output column
    # canonicalizes as '7097.200000' in Spark but float '7097.2' out of
    # DuckDB's fetchdf — invisible at sf0.01 (this query returns 0 rows
    # there) and a hash mismatch the moment rows exist (caught by the
    # round-6 sf0.1 parity sweep)
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(27,6)"))
        .cast("double")
        .alias("totacctbal"),
    )


IDLE_CUSTOMER_ORACLE = """
SELECT c_mktsegment,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(27,6)) >
      (SELECT avg(CAST(c_acctbal AS DECIMAL(27,6))) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


def range_frame_rolling_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (the reference uses only unbounded/row frames):
    per customer, each order's trailing-30-day spend and order count. The
    frame is keyed on an integer day number in both engines, so the RANGE
    semantics are identical (timestamp RANGE frames differ in interval
    handling across engines). One shuffle on o_custkey."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 300)
    day_num = F.datediff("o_orderdate", F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_num)
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.count("*").over(w).alias("orders_30d"),
        F.sum(F.col("o_totalprice").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


RANGE_FRAME_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderdate,
       count(*) OVER w AS orders_30d,
       CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) OVER w AS DOUBLE) AS spend_30d
FROM orders
WHERE o_custkey < 300
WINDOW w AS (
    PARTITION BY o_custkey
    ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
)
"""


REGISTRY: list[tuple] = [
    ("top_unshipped_orders", top_unshipped_orders, TOP_UNSHIPPED_ORACLE),
    ("order_count_distribution", order_count_distribution, ORDER_COUNT_DIST_ORACLE),
    ("idle_customer_balance", idle_customer_balance, IDLE_CUSTOMER_ORACLE),
    ("range_frame_rolling_spend", range_frame_rolling_spend, RANGE_FRAME_ORACLE),
    ("order_priority_semi_count", order_priority_semi_count, ORDER_PRIORITY_ORACLE),
    ("min_price_part_per_type", min_price_part_per_type, MIN_PRICE_PART_ORACLE),
    ("datetime_function_suite", datetime_function_suite, DATETIME_SUITE_ORACLE),
    ("null_handling_suite", null_handling_suite, NULL_SUITE_ORACLE),
    ("map_function_suite", map_function_suite, MAP_SUITE_ORACLE),
    ("grouping_sets_subtotals", grouping_sets_subtotals, GROUPING_SETS_ORACLE),
    ("table_profile", table_profile, TABLE_PROFILE_ORACLE),
    ("key_skew_profile", key_skew_profile, KEY_SKEW_ORACLE),
    ("grouped_string_agg", grouped_string_agg, STRING_AGG_ORACLE),
    ("nation_pair_volume", nation_pair_volume, NATION_PAIR_ORACLE),
    ("embedding_norms", embedding_norms, EMBEDDING_NORMS_ORACLE),
    ("correlation_stats", correlation_stats, CORRELATION_ORACLE),
    ("market_share_by_year", market_share_by_year, MARKET_SHARE_ORACLE),
    ("exact_percentiles", exact_percentiles, EXACT_PERCENTILES_ORACLE),
    ("data_quality_checks", data_quality_checks, DATA_QUALITY_ORACLE),
]
