"""Flagship pipeline — the reference's FULL.py shape on the test star schema.

Mirrors the flagship Glue job stage-for-stage (SURVEY.md §3.1):

1. snapshot/timestamp-filtered scan of the fact table
   (``where createdon >= to_timestamp('2023-01-01')``, FULL.py:210-211)
2. multi-way LEFT equi-join star enrichment (FULL.py:411-475, J1)
3. ``coalesce`` defaults for unmatched dims (FULL.py:497-500, F4)
4. CASE/WHEN bucket remapping (FULL.py:420-434, F5/F6)
5. window top-1 per group — newest record wins
   (``row_number() over (partition by leadid order by sallivedate desc)``,
   FULL.py:744, W2/J5) with a deterministic tiebreaker (SURVEY.md §7 hard
   parts: ties must be broken identically in engine and oracle)
6. global sequential surrogate key
   (``concat('PM', lpad(row_number() over (order by leadid), 9, '0'))``,
   FULL.py:413, W1/F1/F2)
7. formatted-date rendering (``date_format(col,'dd/MM/yyyy')``,
   FULL.py:1346-1347, F10) and final narrow select (FULL.py:1352-1439, P1)

Scale notes (100 TB): the dims are broadcast (they are small lookup tables,
like the reference's option-set CTEs FULL.py:331-409) so the only shuffle is
the window's hash partition on the group key. The global ``row_number`` in
step 6 is the reference's own single-partition hazard (SURVEY.md §4) — it
runs on the *post-top-1* rows (one per group, already reduced), and
:mod:`..operators.surrogate` offers the scalable alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import tune
from ..sources import read_table


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01"))
    )
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")

    # Stage: top-1 per customer (newest order, orderkey as tiebreaker).
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )

    # Stage: star enrichment — dims broadcast, no shuffle on the fact side.
    enriched = (
        latest.join(
            F.broadcast(customer), latest.o_custkey == customer.c_custkey, "left"
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            "o_orderdate",
            F.coalesce("c_name", F.lit("NA")).alias("customer_name"),
            F.coalesce("c_mktsegment", F.lit("NA")).alias("mktsegment"),
            F.coalesce("n_name", F.lit("NA")).alias("nation_name"),
            F.coalesce("r_name", F.lit("NA")).alias("region_name"),
            F.when(F.col("o_totalprice") < 50000, "LOW")
            .when(F.col("o_totalprice") < 150000, "MEDIUM")
            .otherwise("HIGH")
            .alias("price_bucket"),
        )
    )

    # Stage: sequential business key + final select.
    wk = Window.orderBy("o_orderkey")
    return enriched.select(
        F.concat(
            F.lit("PM"),
            F.lpad(F.row_number().over(wk).cast("string"), 9, "0"),
        ).alias("prospect_id"),
        "o_orderkey",
        "customer_name",
        "mktsegment",
        "nation_name",
        "region_name",
        "price_bucket",
        "o_totalprice",
        F.date_format("o_orderdate", "dd/MM/yyyy").alias("order_date_fmt"),
    )


FLAGSHIP_ORACLE = """
WITH latest AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
           ) AS rn
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
), enriched AS (
    SELECT l.o_orderkey,
           l.o_totalprice,
           l.o_orderdate,
           coalesce(c.c_name, 'NA')       AS customer_name,
           coalesce(c.c_mktsegment, 'NA') AS mktsegment,
           coalesce(n.n_name, 'NA')       AS nation_name,
           coalesce(r.r_name, 'NA')       AS region_name,
           CASE WHEN l.o_totalprice < 50000  THEN 'LOW'
                WHEN l.o_totalprice < 150000 THEN 'MEDIUM'
                ELSE 'HIGH' END            AS price_bucket
    FROM latest l
    LEFT JOIN customer c ON l.o_custkey = c.c_custkey
    LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE l.rn = 1
)
SELECT concat('PM', lpad(cast(row_number() OVER (ORDER BY o_orderkey) AS VARCHAR), 9, '0'))
           AS prospect_id,
       o_orderkey,
       customer_name,
       mktsegment,
       nation_name,
       region_name,
       price_bucket,
       o_totalprice,
       strftime(o_orderdate, '%d/%m/%Y') AS order_date_fmt
FROM enriched
"""
