"""Second TPC-H-shaped breadth pack — the remaining classic query shapes
adapted to the fixture star schema (no partsupp / l_commitdate /
l_receiptdate columns exist, so Q9/Q12/Q17/Q20/Q21 shapes substitute
equivalent predicates over the available columns; the *plan shapes* —
filter-only scan, multi-dim star profit, conditional-share, correlated
aggregate, disjunctive residual equi-join, nested EXISTS/NOT-EXISTS —
are the point, per SURVEY.md §2.4 "not present in the reference" gaps).

Numeric policy follows plans/relational.py: monetary sums accumulate in
decimal(27,6) and cast to double once, so value hashes are stable across
engines. Every query broadcasts its dimension sides; the fact table pays
at most one shuffle (the aggregation), which is the 100 TB-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources import read_table


def _dsum(col) -> F.Column:
    return F.sum(
        (F.col(col) if isinstance(col, str) else col).cast("decimal(27,6)")
    ).cast("double")


_REV = "l_extendedprice * (1 - l_discount)"


def revenue_forecast_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: filter-only scan → single global aggregate. All
    three predicates push to the parquet scan (range on date, range on
    discount, bound on quantity); no shuffle beyond the 1-row final agg."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


REVENUE_FORECAST_ORACLE = """
SELECT cast(sum(cast(l_extendedprice * l_discount AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24
"""


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (partsupp-free): profit per supplier-nation per
    order-year over a 4-dim star. part/supplier/nation/orders all
    broadcast; lineitem pays exactly one shuffle, for the (nation, year)
    aggregation. Profit substitutes p_retailprice for ps_supplycost."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.01) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(27,6)")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(orders.select("o_orderkey", "o_orderdate")),
              li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


PRODUCT_PROFIT_ORACLE = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       cast(sum(cast(l_extendedprice * (1 - l_discount)
                     - 0.01 * p_retailprice * l_quantity AS DECIMAL(27,6))) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


def returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer over one
    quarter, top 20. customer/nation broadcast into the fact; the global
    top-20 plans as TakeOrderedAndProject (no full sort at scale)."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(rev).alias("revenue_dec"))
        .join(F.broadcast(cust.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey", "c_name",
            F.col("revenue_dec").cast("double").alias("revenue"),
            "c_acctbal", F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue_dec").desc(), F.col("c_custkey"))
        .limit(20)
    )


RETURNED_ITEM_ORACLE = """
SELECT c_custkey, c_name,
       cast(rev AS DOUBLE) AS revenue,
       c_acctbal, n_name AS nation
FROM (
    SELECT o_custkey, sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS rev
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY o_custkey
) r
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY rev DESC, c_custkey
LIMIT 20
"""


def shipping_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no l_shipmode column: ship-delay buckets stand in
    for ship modes): conditional counts of high- vs low-priority orders
    per delay bucket. One broadcast join + one tiny-key aggregation."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST")
        .when(delay <= 90, "NORMAL")
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_orderdate", "o_orderpriority")),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SHIPPING_DELAY_ORACLE = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'NORMAL'
            ELSE 'SLOW' END AS delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue as a percentage of total for one
    month — conditional-sum ratio inside a single aggregate, part
    broadcast into the date-pruned fact scan."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-06-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-07-01")))
    )
    part = read_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(27,6)")
    )
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo_rev).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_rows"),
        )
    )


PROMO_SHARE_ORACLE = """
SELECT round(100.0 * cast(sum(CASE WHEN p_type = 'PROMO'
                                   THEN cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                                   ELSE cast(0 AS DECIMAL(27,6)) END) AS DOUBLE)
             / cast(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE),
             6) AS promo_revenue_pct,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the global maximum quarterly
    revenue — the CREATE VIEW + scalar MAX subquery expressed as one
    aggregation reused under a global-max window (no second scan)."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    supp = read_table(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_dec"))
    # 100 suppliers post-agg: the empty-frame global-max window is fine here
    # (single partition of 100 rows), unlike a pre-agg global window.
    w = Window.partitionBy()
    best = per_supp.withColumn("max_dec", F.max("total_dec").over(w)).where(
        F.col("total_dec") == F.col("max_dec")
    )
    return best.join(
        F.broadcast(supp.select("s_suppkey", "s_name")),
        best.l_suppkey == F.col("s_suppkey"),
    ).select(
        "s_suppkey", "s_name", F.col("total_dec").cast("double").alias("total_revenue")
    )


TOP_SUPPLIER_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey,
           sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS total_dec
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, cast(total_dec AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_dec = (SELECT max(total_dec) FROM revenue)
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders stopped — a correlated per-part AVG subquery decorrelated into
    an aggregate + broadcast self-join (the plan Spark and every modern
    optimizer produce for Q17)."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    li_part = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    avg_qty = li_part.groupBy("p_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li_part.join(F.broadcast(avg_qty), "p_partkey")
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(_dsum("l_extendedprice") / F.lit(7.0), 6).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


SMALL_QTY_ORACLE = """
WITH li_part AS (
    SELECT l_partkey AS p_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#23'
), avg_qty AS (
    SELECT p_partkey, 0.5 * avg(l_quantity) AS half_avg_qty
    FROM li_part GROUP BY p_partkey
)
SELECT round(cast(sum(cast(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0, 6) AS avg_yearly,
       count(*) AS n_rows
FROM li_part JOIN avg_qty USING (p_partkey)
WHERE l_quantity < half_avg_qty
"""


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a threshold
    (GROUP BY … HAVING over the fact), then enriched with customer and
    order attributes. The HAVING prunes before the broadcast joins."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(F.broadcast(orders.select("o_orderkey", "o_custkey", "o_orderdate",
                                           "o_totalprice")),
                 big.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
    )


LARGE_VOLUME_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       cast(total_qty AS DOUBLE) AS total_qty
FROM (
    SELECT l_orderkey, sum(l_quantity) AS total_qty
    FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
) b
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def disjunctive_bracket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join on partkey with an OR of three ANDed
    predicate brackets as the residual. Unlike the reference's pure-OR
    theta join (J3 → BNLJ), the shared equality key keeps this a
    broadcast HASH join — the residual filters after probing, which is
    the scalable way to run disjunctive predicates."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 30)))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
                li.l_partkey == F.col("p_partkey"))
        .where(bracket)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


DISJUNCTIVE_BRACKET_ORACLE = """
SELECT cast(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def lonely_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *only* late shipper on a
    multi-supplier order — EXISTS (another supplier on the order) plus
    NOT EXISTS (another late supplier). "Late" adapts to the fixture as
    shipping >60 days after order date. Decorrelated into one per-order
    aggregate (distinct supplier counts, total vs late) joined back to
    the late lines — one shuffle on orderkey instead of two correlated
    self-join passes over lineitem."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier")
    lo = li.join(
        F.broadcast(orders.select("o_orderkey", "o_orderdate", "o_orderstatus")),
        li.l_orderkey == F.col("o_orderkey"),
    ).where(F.col("o_orderstatus") == "F")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    per_order = lo.groupBy("o_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    late_lines = lo.where(late).select("o_orderkey", "l_suppkey").distinct()
    return (
        late_lines.join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            "o_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


LONELY_LATE_ORACLE = """
WITH lo AS (
    SELECT o_orderkey, l_suppkey,
           date_diff('day', o_orderdate, l_shipdate) > 60 AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
), per_order AS (
    SELECT o_orderkey,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
    FROM lo GROUP BY o_orderkey
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM (SELECT DISTINCT o_orderkey, l_suppkey FROM lo WHERE is_late) late
JOIN per_order USING (o_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_suppkey, s_name
"""


def part_supplier_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp-free: supply relationships recovered from
    lineitem): distinct supplier count per part attribute combination,
    excluding one brand and suppliers with negative balances (the NOT IN
    subquery → broadcast anti join)."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#1")
    bad_supp = (
        read_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.select("l_partkey", "l_suppkey").distinct()
        .join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


PART_SUPPLIER_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


REGISTRY: list[tuple] = [
    ("revenue_forecast_filter_agg", revenue_forecast_filter_agg, REVENUE_FORECAST_ORACLE),
    ("product_type_profit", product_type_profit, PRODUCT_PROFIT_ORACLE),
    ("returned_item_ranking", returned_item_ranking, RETURNED_ITEM_ORACLE),
    ("shipping_delay_buckets", shipping_delay_buckets, SHIPPING_DELAY_ORACLE),
    ("promo_revenue_share", promo_revenue_share, PROMO_SHARE_ORACLE),
    ("top_supplier_revenue", top_supplier_revenue, TOP_SUPPLIER_ORACLE),
    ("small_quantity_revenue", small_quantity_revenue, SMALL_QTY_ORACLE),
    ("large_volume_customers", large_volume_customers, LARGE_VOLUME_ORACLE),
    ("disjunctive_bracket_join", disjunctive_bracket_join, DISJUNCTIVE_BRACKET_ORACLE),
    ("lonely_late_suppliers", lonely_late_suppliers, LONELY_LATE_ORACLE),
    ("part_supplier_breadth", part_supplier_breadth, PART_SUPPLIER_ORACLE),
]


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where the supplier and the
    customer sit in the SAME nation, restricted to one region and one
    order-date year. All dimension sides (customer/supplier/nation/region)
    broadcast; the lineitem→orders join is the only large shuffle and the
    final per-nation aggregation rides the same exchange under AQE.
    Reference parity: star enrichment joins FULL.py:411-475 with an extra
    equality tying two dimension roles together."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    local_nations = (
        nation.join(
            F.broadcast(region.select("r_regionkey")),
            nation.n_regionkey == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                supp.select("s_suppkey", F.col("s_nationkey").alias("supp_nk"))
            ),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .where(F.col("c_nationkey") == F.col("supp_nk"))
        .join(F.broadcast(local_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(_dsum(F.expr(_REV)).alias("revenue"))
    )


LOCAL_SUPPLIER_ORACLE = """
SELECT n_name,
       cast(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
  AND c_nationkey = s_nationkey
GROUP BY n_name
"""


def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp-free: supply value recovered from
    lineitem): per-part total supplied value restricted to suppliers of
    one nation, keeping parts whose value exceeds a FRACTION OF THE
    GLOBAL TOTAL — the scalar-subquery HAVING. The global total comes
    from a 1-row aggregate broadcast back over the per-part aggregate
    (two passes over the same pre-aggregated frame, not two fact scans:
    the per-part aggregate is computed once and self-aggregated)."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    nation_supp = supp.join(
        F.broadcast(nation.select("n_nationkey")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(nation_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(_dsum(F.expr("l_extendedprice * l_quantity")).alias("part_value"))
    )
    total = per_part.agg(
        (F.sum("part_value") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


IMPORTANT_PART_ORACLE = """
WITH per_part AS (
    SELECT l_partkey,
           cast(sum(cast(l_extendedprice * l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS part_value
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5')
    GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT sum(part_value) * 0.001 FROM per_part)
"""


def heavy_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (partsupp-free): suppliers who shipped MORE THAN
    HALF the 1995 volume of any 'small %' part — a correlated quantity
    threshold decorrelated into (a) per-(part) total over a filtered fact
    slice, (b) per-(part,supplier) total over the same slice, (c) a
    broadcast semi-join back to supplier/nation. The fact slice is scanned
    once and aggregated twice at different granularities."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    slice_ = (
        li.where(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
        )
        .join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    per_ps = slice_.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = slice_.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum("l_quantity") * F.lit(0.5)).alias("half_qty")
    )
    qualifying = (
        per_ps.join(
            F.broadcast(per_part),
            (per_ps.l_partkey == F.col("pk")) & (F.col("supp_qty") > F.col("half_qty")),
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(qualifying), supp.s_suppkey == F.col("l_suppkey"), "semi")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )


HEAVY_PART_ORACLE = """
WITH slice AS (
    SELECT l_partkey, l_suppkey, l_quantity
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
),
per_ps AS (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
    FROM slice GROUP BY 1, 2
),
per_part AS (
    SELECT l_partkey, sum(l_quantity) * 0.5 AS half_qty FROM slice GROUP BY 1
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM per_ps JOIN per_part USING (l_partkey)
    WHERE supp_qty > half_qty)
"""


def value_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value-function breadth beyond the reference's row_number-only
    surface (SURVEY §2.6): first_value / last_value / nth_value over a
    running frame, cume_dist, and a full-partition frame — per customer
    over order history. One shuffle on the partition key; all functions
    share a single window exchange."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 300)
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_ord = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w_run).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
        F.cume_dist().over(w_ord).alias("cd"),
    )


VALUE_WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w_run AS first_price,
       last_value(o_totalprice) OVER w_full AS last_price,
       nth_value(o_totalprice, 2) OVER w_full AS second_price,
       cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS cd
FROM orders
WHERE o_custkey < 300
WINDOW w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


REGISTRY += [
    ("local_supplier_volume", local_supplier_volume, LOCAL_SUPPLIER_ORACLE),
    ("important_part_values", important_part_values, IMPORTANT_PART_ORACLE),
    ("heavy_part_suppliers", heavy_part_suppliers, HEAVY_PART_ORACLE),
    ("value_window_suite", value_window_suite, VALUE_WINDOW_ORACLE),
]
