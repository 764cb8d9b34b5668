"""Relational core — SURVEY.md §2.3-2.8 operator coverage as driver queries.

Each entry exercises one reference operator family on the test star schema
and carries a DuckDB oracle. Numeric policy: monetary sums go through
``decimal(27,6)`` then cast to double, so both engines do exact decimal
accumulation and a single final rounding — float-sum order noise cannot
break the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import (
    anti_join_new_rows,
    scalable_key,
    sequential_key,
    top1_per_group,
)
from ..session import tune
from ..sources import read_table


def _dsum(col) -> F.Column:
    """Deterministic cross-engine sum of a double column."""
    return F.sum(F.col(col).cast("decimal(27,6)") if isinstance(col, str) else col.cast("decimal(27,6)")).cast("double")


# --- A-group: aggregation (SURVEY §2.5; capability required by driver oracle
# even though the reference only uses count/distinct/having) -----------------

def pricing_summary_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped groupBy/agg: map-side partial aggregation + one
    shuffle on the (tiny-cardinality) group key — the scalable agg shape.

    The three averages run as exact integer-micro half-up divisions, not
    ``round(avg(double), 6)``: the inputs are fixed-precision (2-dp money,
    integral quantities), so the true group mean is a rational that CAN
    land exactly on a 6-dp half-point — where a float avg is one
    summation-order ulp from flipping the round, between engines or even
    between Spark's own runs (measured boundary distance at sf0.1 gets
    within 2e-10; the deep-pipeline nation average actually flipped).

    The micro sums for quantity/price are NOT extra aggregates: because
    the inputs are exact fixed-point, ``round(col * 1e6)`` summed per-row
    equals the exact decimal group sum shifted by 1e6 — so ``avg_qty`` /
    ``avg_price`` derive POST-agg from the same decimal sums that feed
    ``sum_qty`` / ``sum_base_price`` (one map-side expression each fewer;
    only ``l_discount``, which has no output sum, keeps a dedicated micro
    aggregate). The shift stays in decimal arithmetic (38,6 ≫ the 1e16
    magnitudes here), so no float touches the value before the division."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,6)"
    )
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    ).cast("decimal(27,6)")

    def dec(col: str):
        return F.sum(F.col(col).cast("decimal(27,6)"))

    # half-up micro mean as exact double, micro sum derived from the exact
    # decimal group sum (scale-6 value × 1e6 is integral by construction)
    avg6 = lambda s: (  # noqa: E731
        F.expr(
            f"(2 * CAST({s} * 1000000 AS BIGINT) + count_order)"
            " DIV (2 * count_order)"
        ).cast("double")
        / 1e6
    )
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec("l_quantity").alias("__sq"),
            dec("l_extendedprice").alias("__sp"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.sum(F.round(F.col("l_discount") * 1e6).cast("long")).alias("__d"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("__sq").cast("double").alias("sum_qty"),
            F.col("__sp").cast("double").alias("sum_base_price"),
            "sum_disc_price",
            "sum_charge",
            avg6("__sq").alias("avg_qty"),
            avg6("__sp").alias("avg_price"),
            (
                F.expr("(2 * __d + count_order) DIV (2 * count_order)").cast(
                    "double"
                )
                / 1e6
            ).alias("avg_disc"),
            "count_order",
        )
    )


PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity       AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
       cast(sum(cast(l_extendedprice  AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
       cast(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
       cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
       CAST((2 * sum(CAST(round(l_quantity * 1e6) AS BIGINT)) + count(*))
            // (2 * count(*)) AS DOUBLE) / 1e6 AS avg_qty,
       CAST((2 * sum(CAST(round(l_extendedprice * 1e6) AS BIGINT)) + count(*))
            // (2 * count(*)) AS DOUBLE) / 1e6 AS avg_price,
       CAST((2 * sum(CAST(round(l_discount * 1e6) AS BIGINT)) + count(*))
            // (2 * count(*)) AS DOUBLE) / 1e6 AS avg_disc,
       count(*)                       AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def regional_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-way join (reference J1 star enrichment,
    FULL.py:411-475). Broadcast hints go ONLY on the true dimensions
    (supplier/nation/region — bounded or sub-linear in SF); `orders` and
    `customer` are fact-sized (~1.5B / ~150M rows at the 100 TB target),
    so forcing them into a broadcast exchange would OOM the driver at
    scale. AQE picks shuffle-hash vs broadcast for those two by the
    MEASURED post-filter size, which is the plan that survives a 100×
    scale-up unchanged."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(27,6)"
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == orders.o_orderkey)
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              (li.l_suppkey == supplier.s_suppkey) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


REGIONAL_REVENUE_ORACLE = """
SELECT n_name,
       cast(sum(cast(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- P-group: projections / filters (SURVEY §2.3) ---------------------------

def filter_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P4/P5/P6/P8 combined: every predicate lands in PushedFilters and
    the scan reads only 5 columns (check with .explain('formatted'))."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-06-01")))
        & (F.col("l_returnflag") != "A")
        & (F.col("l_returnflag").isin("N", "R"))
        & (F.col("l_quantity").isNotNull())
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")


FILTER_PUSHDOWN_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-06-01'
  AND l_returnflag <> 'A'
  AND l_returnflag IN ('N', 'R')
  AND l_quantity IS NOT NULL
  AND l_quantity > 45
"""


def distinct_option_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/P10/D5: the reference's option-set lookup build — 7 ``select
    distinct attributevalue, value`` CTEs over one EAV table (FULL.py:331-409)."""
    tune(spark)
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH opts AS (
            SELECT DISTINCT o_orderpriority AS option_code, o_orderstatus AS status_code
            FROM orders_v
        )
        SELECT option_code, status_code FROM opts
        """
    )


DISTINCT_OPTION_ORACLE = """
SELECT DISTINCT o_orderpriority AS option_code, o_orderstatus AS status_code
FROM orders
"""


# --- A2: group-by/having duplicate detection (FULL.py:1075-1084) ------------

def groupby_having_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    part = read_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_name")
        .agg(
            F.count("*").alias("cnt"),
            F.countDistinct("p_brand").alias("n_brands"),
        )
        .where(F.col("cnt") > 1)
    )


GROUPBY_HAVING_ORACLE = """
SELECT p_name, count(*) AS cnt, count(DISTINCT p_brand) AS n_brands
FROM part
GROUP BY p_name
HAVING count(*) > 1
"""


# --- W-group: windows (SURVEY §2.6) -----------------------------------------

def window_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/J5: newest lineitem per order (the reference's top-1 dedup,
    FULL.py:744). (l_orderkey, l_linenumber) is NOT unique in the test
    data, so the tiebreak chain extends to (partkey, suppkey) which is —
    exactly the determinism hazard SURVEY.md §7 flags for ties on
    ``sallivedate``."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return top1_per_group(
        li,
        ["l_orderkey"],
        [
            F.col("l_shipdate").desc(),
            F.col("l_linenumber").desc(),
            F.col("l_partkey").desc(),
            F.col("l_suppkey").desc(),
        ],
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")


WINDOW_TOP1_ORACLE = """
SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY l_orderkey
        ORDER BY l_shipdate DESC, l_linenumber DESC, l_partkey DESC, l_suppkey DESC
    ) AS rn
    FROM lineitem
)
WHERE rn = 1
"""


_SURROGATE_ORACLE = """
SELECT concat('PM', lpad(cast(row_number() OVER (ORDER BY c_custkey) AS VARCHAR), 9, '0'))
           AS surrogate_id,
       c_custkey, c_name
FROM customer
"""


def sequential_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 exact parity: global sequential business key (FULL.py:413)."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer")
    return sequential_key(cust, ["c_custkey"]).select(
        "surrogate_id", "c_custkey", "c_name"
    )


def scalable_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ids as :func:`sequential_surrogate_key` (same oracle!) without
    the single-task global window — the 100 TB-safe variant."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer")
    return scalable_key(cust, ["c_custkey"], num_partitions=8).select(
        "surrogate_id", "c_custkey", "c_name"
    )


# --- J-group: joins (SURVEY §2.4) -------------------------------------------

def disjunctive_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: OR-of-equalities left join with the reference's SQL precedence
    ``a = b OR c = d AND e`` ⇒ ``a=b OR (c=d AND e)`` (FULL.py:747-752).
    Plans as BroadcastNestedLoopJoin — the dim must be broadcast-small."""
    tune(spark)
    sup = read_table(spark, sf_dir, "supplier")
    nat = read_table(spark, sf_dir, "nation")
    cond = (sup.s_nationkey == nat.n_nationkey) | (
        (sup.s_suppkey == nat.n_nationkey) & (sup.s_acctbal < 0)
    )
    return sup.join(F.broadcast(nat), cond, "left").select(
        "s_suppkey", "s_name", "s_acctbal", "n_nationkey", "n_name"
    )


DISJUNCTIVE_JOIN_ORACLE = """
SELECT s_suppkey, s_name, s_acctbal, n_nationkey, n_name
FROM supplier LEFT JOIN nation
  ON s_nationkey = n_nationkey OR s_suppkey = n_nationkey AND s_acctbal < 0
"""


def anti_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: null-guarded NOT-IN incremental load (OUTBOUND.py:206-224) as a
    left_anti join — only key columns shuffle, never the payload."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    already_loaded = orders.where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1996-01-01"))
    )
    return anti_join_new_rows(orders, already_loaded, "o_orderkey").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )


ANTI_JOIN_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate
FROM orders
WHERE o_orderkey NOT IN (
    SELECT coalesce(o_orderkey, -1) FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01'
)
"""


def self_join_dup_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: the reference's model/variant disambiguation (FULL.py:1086-1104) —
    left join a table to its own grouped-duplicate set and suffix ambiguous
    names with their key."""
    tune(spark)
    part = read_table(spark, sf_dir, "part")
    dups = (
        part.groupBy("p_name")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
        .select(F.col("p_name").alias("dup_name"))
    )
    return part.join(
        F.broadcast(dups), part.p_name == dups.dup_name, "left"
    ).select(
        "p_partkey",
        F.when(
            F.col("dup_name").isNotNull(),
            F.concat(F.col("p_name"), F.lit(" ["), F.col("p_partkey").cast("string"), F.lit("]")),
        )
        .otherwise(F.col("p_name"))
        .alias("display_name"),
    )


SELF_JOIN_DUP_ORACLE = """
WITH dups AS (
    SELECT p_name AS dup_name FROM part GROUP BY p_name HAVING count(*) > 1
)
SELECT p_partkey,
       CASE WHEN dup_name IS NOT NULL
            THEN concat(p_name, ' [', cast(p_partkey AS VARCHAR), ']')
            ELSE p_name END AS display_name
FROM part LEFT JOIN dups ON p_name = dup_name
"""


# --- U-group: set ops + reconciliation (SURVEY §2.7, §5) --------------------

def union_except_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2: split → unionByName → bidirectional exceptAll must count 0
    both ways (the reference's MINUS reconciliation, OUTBOUND.py:422-449)."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    open_part = orders.where(F.col("o_orderstatus") == "O")
    rest = orders.where(F.col("o_orderstatus") != "O")
    reunified = open_part.unionByName(rest)
    src_minus_tgt = orders.exceptAll(reunified).agg(
        F.count("*").alias("src_minus_tgt")
    )
    tgt_minus_src = reunified.exceptAll(orders).agg(
        F.count("*").alias("tgt_minus_src")
    )
    return src_minus_tgt.crossJoin(tgt_minus_src)


UNION_EXCEPT_ORACLE = """
WITH reunified AS (
    SELECT * FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT * FROM orders WHERE o_orderstatus <> 'O'
)
SELECT
    (SELECT count(*) FROM (SELECT * FROM orders EXCEPT ALL SELECT * FROM reunified)) AS src_minus_tgt,
    (SELECT count(*) FROM (SELECT * FROM reunified EXCEPT ALL SELECT * FROM orders)) AS tgt_minus_src
"""


# --- F-group: scalar functions (SURVEY §2.8) --------------------------------

def scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F8/F14 on one row-level select: concat_ws, substring_index parse-
    back (the reference's dealer-code parsing, FULL.py:720-726), lpad key
    build, trim, nullif/coalesce defaulting, CASE buckets, substring."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer")
    ck = F.concat_ws("-", F.col("c_mktsegment"), F.col("c_name"))
    return cust.select(
        "c_custkey",
        ck.alias("compound_key"),
        F.substring_index(F.substring_index(ck, "-", 2), "-", -1).alias("parsed_name"),
        F.concat(F.lit("CK"), F.lpad(F.col("c_custkey").cast("string"), 9, "0")).alias("padded_key"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed_name"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("DEFAULT")).alias("segment_or_default"),
        F.when(F.col("c_acctbal") < 0, "NEGATIVE")
        .when(F.col("c_acctbal") < 5000, "MID")
        .otherwise("HIGH")
        .alias("balance_bucket"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.lower(F.col("c_mktsegment")).alias("segment_lower"),
    )


SCALAR_SUITE_ORACLE = """
SELECT c_custkey,
       concat_ws('-', c_mktsegment, c_name)                    AS compound_key,
       split_part(concat_ws('-', c_mktsegment, c_name), '-', 2) AS parsed_name,
       concat('CK', lpad(cast(c_custkey AS VARCHAR), 9, '0'))  AS padded_key,
       trim(concat('  ', c_name, '  '))                        AS trimmed_name,
       coalesce(nullif(c_mktsegment, 'MACHINERY'), 'DEFAULT')  AS segment_or_default,
       CASE WHEN c_acctbal < 0    THEN 'NEGATIVE'
            WHEN c_acctbal < 5000 THEN 'MID'
            ELSE 'HIGH' END                                    AS balance_bucket,
       substring(c_name, 1, 8)                                 AS name_prefix,
       lower(c_mktsegment)                                     AS segment_lower
FROM customer
"""


def timezone_shift_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F10/F11: the reference's hand-rolled UTC→IST shift
    ``from_unixtime(unix_timestamp(col) + 5*3600 + 30*60)`` (FULL.py:215-216)
    and its dd/MM/yyyy renderings (FULL.py:1346-1347)."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.from_unixtime(F.unix_timestamp(F.col("o_orderdate")) + 5 * 3600 + 30 * 60).alias("ist_ts"),
        F.date_format("o_orderdate", "dd/MM/yyyy").alias("date_dmy"),
        F.date_format("o_orderdate", "dd/MM/yyyy HH:mm:ss").alias("ts_dmy"),
    )


TIMEZONE_SHIFT_ORACLE = """
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 330 MINUTE, '%Y-%m-%d %H:%M:%S') AS ist_ts,
       strftime(o_orderdate, '%d/%m/%Y')          AS date_dmy,
       strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS ts_dmy
FROM orders
"""


def case_when_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6: deep when/otherwise chains — the reference's 17-branch
    prospectType map (FULL.py:599-615) and IN-list channel correction
    (FULL.py:1256-1265)."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", "P0")
        .when(F.col("o_orderpriority") == "2-HIGH", "P1")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "P2")
        .when(F.col("o_orderpriority") == "4-NOT SPECIFIED", "P3")
        .otherwise("P4")
        .alias("priority_code"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") == "F"),
            "EXPEDITED_DONE",
        )
        .when(F.col("o_orderstatus") == "O", "OPEN")
        .otherwise("STANDARD")
        .alias("channel"),
    )


CASE_WHEN_ORACLE = """
SELECT o_orderkey,
       CASE o_orderpriority
            WHEN '1-URGENT' THEN 'P0'
            WHEN '2-HIGH' THEN 'P1'
            WHEN '3-MEDIUM' THEN 'P2'
            WHEN '4-NOT SPECIFIED' THEN 'P3'
            ELSE 'P4' END AS priority_code,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus = 'F'
            THEN 'EXPEDITED_DONE'
            WHEN o_orderstatus = 'O' THEN 'OPEN'
            ELSE 'STANDARD' END AS channel
FROM orders
"""


# --- beyond-parity capability: rollup/cube + lag/lead (absent from the
# reference — SURVEY.md §2.5/§2.6 "not present" lists — but table stakes
# for an analytics engine; cheap to cover with built-ins + oracles) --------

def rollup_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


ROLLUP_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       cast(sum(cast(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def lag_lead_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune(spark)
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 5)
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_partkey"
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.sum("l_quantity")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("running_qty"),
    )


LAG_LEAD_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
       lag(l_quantity)  OVER w AS prev_qty,
       lead(l_quantity) OVER w AS next_qty,
       sum(l_quantity)  OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS running_qty
FROM lineitem
WHERE l_suppkey <= 5
WINDOW w AS (
    PARTITION BY l_suppkey
    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
)
"""


# --- beyond-parity join modes: the reference uses only LEFT/ANTI
# (SURVEY.md §2.4 "not present" note) — semi and full-outer round out the
# engine's join surface ------------------------------------------------------

def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi = EXISTS: customers with at least one high-value order.
    Plans as a broadcast/hash semi join — no fanout, no right columns."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 100000
    )
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SEMI_JOIN_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
)
"""


def full_outer_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of the customer dim against per-customer order
    counts — rows survive from both unmatched sides."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    per_cust = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        cust.join(per_cust, cust["c_custkey"] == per_cust["o_custkey"], "full")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.coalesce("c_name", F.lit("UNKNOWN")).alias("c_name"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


FULL_OUTER_ORACLE = """
SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
       coalesce(c.c_name, 'UNKNOWN') AS c_name,
       coalesce(o.n_orders, 0) AS n_orders
FROM customer c
FULL OUTER JOIN (
    SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
) o ON c.c_custkey = o.o_custkey
"""


def cube_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(_dsum("o_totalprice").alias("sum_price"), F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "sum_price",
            "n",
        )
    )


CUBE_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
       coalesce(o_orderpriority, 'ALL') AS orderpriority,
       cast(sum(cast(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price,
       count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def stats_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/stddev/variance/filtered-sum/exact distinct count — the
    statistics surface beyond the reference's count/distinct (SURVEY.md
    §2.5 'not present' list)."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        _dsum(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(
                F.lit(0.0)
            )
        ).alias("discounted_revenue"),
        F.count("*").alias("n_rows"),
    )


STATS_AGG_ORACLE = """
SELECT l_returnflag,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       count(DISTINCT l_suppkey) AS n_suppliers,
       cast(sum(cast(CASE WHEN l_discount > 0.05 THEN l_extendedprice
                          ELSE 0.0 END AS DECIMAL(27,6))) AS DOUBLE)
           AS discounted_revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIAS = ["urgent", "high", "medium", "notspec", "low"]


def pivot_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot with an explicit value list — pinning the values keeps the
    plan a single pass (no values-discovery job) and the schema static, the
    only safe form at scale."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    return wide.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(a)
            for p, a in zip(_PRIORITIES, _PRIO_ALIAS)
        ],
    )


PIVOT_ORACLE = """
SELECT o_orderstatus,
       count(*) FILTER (o_orderpriority = '1-URGENT')        AS urgent,
       count(*) FILTER (o_orderpriority = '2-HIGH')          AS high,
       count(*) FILTER (o_orderpriority = '3-MEDIUM')        AS medium,
       count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS notspec,
       count(*) FILTER (o_orderpriority = '5-LOW')           AS low
FROM orders
GROUP BY o_orderstatus
"""


def unpivot_quantity_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form melt of per-flag aggregates (DataFrame.unpivot)."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        _dsum("l_quantity").alias("qty"),
        _dsum("l_extendedprice").alias("price"),
        _dsum("l_discount").alias("disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


UNPIVOT_ORACLE = """
WITH wide AS (
    SELECT l_returnflag,
           cast(sum(cast(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS qty,
           cast(sum(cast(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS price,
           cast(sum(cast(l_discount AS DECIMAL(27,6))) AS DOUBLE) AS disc
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'qty' AS metric, qty AS value FROM wide
UNION ALL SELECT l_returnflag, 'price', price FROM wide
UNION ALL SELECT l_returnflag, 'disc', disc FROM wide
"""


def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal explode (posexplode) — position-preserving flattening, the
    array↔rows bridge the nested-document model needs in reverse."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = docs.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")), "\\s+"
        ).alias("toks"),
    )
    return toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "tok")


POSEXPLODE_ORACLE = """
WITH t AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+'
           ) AS toks
    FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
       unnest(toks) AS tok
FROM t
"""


def array_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column algebra over tokenized text: sort, membership, slice,
    dedup-count — all JVM expressions with DuckDB list twins."""
    tune(spark)
    docs = read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = docs.select(
        "doc_id",
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")), "\\s+"
        ).alias("toks"),
    )
    return toks.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.array_contains("toks", "data").alias("has_data"),
        # arrays are projected to a scalar (csv) form — the driver's oracle
        # harness canonicalizes cells with pandas, which cannot hash lists
        F.concat_ws(",", F.slice(F.sort_array("toks"), 1, 3)).alias("first3_csv"),
        F.element_at(F.sort_array("toks", asc=False), 1).alias("max_tok"),
    )


ARRAY_SUITE_ORACLE = """
WITH t AS (
    SELECT doc_id,
           string_split_regex(
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\\s+'
           ) AS toks
    FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_toks,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       list_contains(toks, 'data') AS has_data,
       array_to_string(list_sort(toks)[1:3], ',') AS first3_csv,
       list_sort(toks, 'DESC')[1] AS max_tok
FROM t
"""


def string_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function breadth: regexp_extract, translate, repeat/reverse,
    padding, case transforms — beyond the reference's F1-F15 set."""
    tune(spark)
    cust = read_table(spark, sf_dir, "customer").where(F.col("c_custkey") < 300)
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lower_vowels"),
        F.reverse("c_name").alias("name_rev"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
        F.length("c_name").alias("name_len"),
        F.locate("#", "c_name").cast("int").alias("hash_pos"),
    )


STRING_SUITE_ORACLE = """
SELECT c_custkey,
       coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_digits,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
       reverse(c_name) AS name_rev,
       rpad(c_mktsegment, 12, '.') AS seg_padded,
       -- initcap capitalizes each word's first letter
       list_aggregate(
           list_transform(string_split(lower(c_mktsegment), ' '),
                          s -> upper(s[1]) || s[2:]),
           'string_agg', ' ') AS seg_title,
       CAST(length(c_name) AS INT) AS name_len,
       CAST(strpos(c_name, '#') AS INT) AS hash_pos
FROM customer WHERE c_custkey < 300
"""


def ranking_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function breadth (rank/dense_rank/ntile/percent_rank) —
    SURVEY §2.6 notes the reference uses only row_number."""
    from pyspark.sql import Window

    tune(spark)
    sup = read_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
    )


RANKING_WINDOW_ORACLE = """
SELECT s_suppkey, s_nationkey,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 9) AS pct_rank
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
"""


def intersect_common_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — customers appearing in both the high-value-order set and
    the urgent-order set (completes the set-op family next to U1/U2)."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    high = orders.where(F.col("o_totalprice") > 150000).select("o_custkey")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return high.intersect(urgent)


INTERSECT_ORACLE = """
SELECT o_custkey FROM orders WHERE o_totalprice > 150000
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def approx_distinct_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch outputs (HLL distinct counts, KLL percentiles) — the
    estimator values themselves, engine-specific by definition. Used by
    tests/test_approx_aggs.py, which bounds them against exact answers."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("p99_price"),
    )


def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates — the only viable distinct/quantile path at
    100 TB (exact countDistinct shuffles every key; HLL/KLL merge in fixed
    memory) — made ORACLE-CHECKABLE: raw sketch values are engine-specific,
    so the gate output carries the exact distinct counts (cross-engine
    comparable) plus booleans asserting each sketch landed inside its
    published error bound, computed IN the query. HLL at the default
    rsd=0.05 is allowed 3σ ≈ 15% relative error; percentile_approx at
    accuracy=1000 has rank error ≤ 1/1000, asserted with slack as
    value-between-exact-percentiles(±1%). The DuckDB oracle recomputes the
    exact counts and pins every bound column TRUE — a Spark sketch outside
    its bound now FAILS the hash compare instead of hiding behind a
    rows-only check.

    GATE-ONLY: the in-query error-bound booleans cost two exact
    countDistincts plus four exact percentiles — at 100 TB that is
    precisely the exact-key shuffle the sketches exist to avoid.  Never
    benchmark or deploy this form; :func:`approx_distinct_raw` is the
    production sketch path (fixed-memory HLL/KLL merge, no exact
    aggregates)."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    raw = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_suppkey").alias("approx_suppliers"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("p99_price"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.expr("percentile(l_extendedprice, 0.49)").alias("p49_exact"),
        F.expr("percentile(l_extendedprice, 0.51)").alias("p51_exact"),
        F.expr("percentile(l_extendedprice, 0.98)").alias("p98_exact"),
        F.expr("percentile(l_extendedprice, 0.995)").alias("p995_exact"),
    )
    within = lambda a, e: (  # noqa: E731 — local bound predicate
        F.abs(F.col(a) - F.col(e)) <= 0.15 * F.col(e)
    )
    return raw.select(
        "l_returnflag",
        "exact_orders",
        "exact_suppliers",
        within("approx_orders", "exact_orders").alias("orders_in_bound"),
        within("approx_suppliers", "exact_suppliers").alias("suppliers_in_bound"),
        F.col("p50_price").between(F.col("p49_exact"), F.col("p51_exact")).alias(
            "p50_in_band"
        ),
        F.col("p99_price").between(F.col("p98_exact"), F.col("p995_exact")).alias(
            "p99_in_band"
        ),
    )


APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       count(DISTINCT l_suppkey) AS exact_suppliers,
       TRUE AS orders_in_bound,
       TRUE AS suppliers_in_bound,
       TRUE AS p50_in_band,
       TRUE AS p99_in_band
FROM lineitem GROUP BY l_returnflag
"""


# r13+r14 registry swaps: rows retired from the driver gate (COVERAGE.md
# "Retire-and-swap shortlist") — their semantics stay gate-covered by
# surviving rows (SURVEY §2: P10/A4 via groupby_having_dups, F7 via
# scalar_function_suite, F9 via datetime_function_suite's ist_ts column,
# F10 via the flagship's dd/MM/yyyy render; W1's reference-exact form via
# sequential_surrogate_key; ROLLUP's grouping-set semantics via the
# surviving grouping_sets_subtotals and cube_subtotals rows), the plan
# functions stay implemented above, and tests/test_retired_queries.py keeps
# hash-verifying each against its oracle every session.
RETIRED: list[tuple] = [
    ("distinct_option_lookup", distinct_option_lookup, DISTINCT_OPTION_ORACLE),
    ("timezone_shift_format", timezone_shift_format, TIMEZONE_SHIFT_ORACLE),
    ("string_function_suite", string_function_suite, STRING_SUITE_ORACLE),
    # r14 retirees: scalable_surrogate_key shares _SURROGATE_ORACLE with the
    # surviving sequential_surrogate_key (its zipWithIndex-free scale
    # property stays pinned by tests/test_plan_quality.py); rollup_subtotals
    # is the hierarchical special case of the grouping-set family whose
    # general and cube rows both keep gate slots.
    ("scalable_surrogate_key", scalable_surrogate_key, _SURROGATE_ORACLE),
    ("rollup_subtotals", rollup_subtotals, ROLLUP_ORACLE),
]

REGISTRY: list[tuple] = [
    ("pricing_summary_agg", pricing_summary_agg, PRICING_SUMMARY_ORACLE),
    ("regional_revenue_join", regional_revenue_join, REGIONAL_REVENUE_ORACLE),
    ("filter_pushdown_scan", filter_pushdown_scan, FILTER_PUSHDOWN_ORACLE),
    ("groupby_having_dups", groupby_having_dups, GROUPBY_HAVING_ORACLE),
    ("window_top1_per_group", window_top1_per_group, WINDOW_TOP1_ORACLE),
    ("sequential_surrogate_key", sequential_surrogate_key, _SURROGATE_ORACLE),
    ("disjunctive_theta_join", disjunctive_theta_join, DISJUNCTIVE_JOIN_ORACLE),
    ("anti_join_incremental", anti_join_incremental, ANTI_JOIN_ORACLE),
    ("self_join_dup_suffix", self_join_dup_suffix, SELF_JOIN_DUP_ORACLE),
    ("union_except_reconcile", union_except_reconcile, UNION_EXCEPT_ORACLE),
    ("scalar_function_suite", scalar_function_suite, SCALAR_SUITE_ORACLE),
    ("case_when_remap", case_when_remap, CASE_WHEN_ORACLE),
    ("lag_lead_running", lag_lead_running, LAG_LEAD_ORACLE),
    ("semi_join_exists", semi_join_exists, SEMI_JOIN_ORACLE),
    ("full_outer_align", full_outer_align, FULL_OUTER_ORACLE),
    ("cube_subtotals", cube_subtotals, CUBE_ORACLE),
    ("stats_agg_suite", stats_agg_suite, STATS_AGG_ORACLE),
    ("pivot_priority_counts", pivot_priority_counts, PIVOT_ORACLE),
    ("unpivot_quantity_metrics", unpivot_quantity_metrics, UNPIVOT_ORACLE),
    ("approx_distinct_stats", approx_distinct_stats, APPROX_DISTINCT_ORACLE),
    ("posexplode_tokens", posexplode_tokens, POSEXPLODE_ORACLE),
    ("array_function_suite", array_function_suite, ARRAY_SUITE_ORACLE),
    ("ranking_window_suite", ranking_window_suite, RANKING_WINDOW_ORACLE),
    ("intersect_common_customers", intersect_common_customers, INTERSECT_ORACLE),
]
