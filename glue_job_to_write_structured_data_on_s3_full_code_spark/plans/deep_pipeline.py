"""Deep-plan fidelity pipeline — the reference flagship at FULL DEPTH.

Every individual stage shape of the reference's ~18-stage flagship job
(FULL.py:193-1449) already exists in this repo as a separate oracled
query; this module chains them into ONE registered pipeline at reference
depth, because the one thing a stage-at-a-time suite never stresses is
Catalyst analysis/optimization time on a very deep plan (SURVEY.md §4)
and the lineage-break operator that the reference leans on for it.

Stage map (reference citation → here):

1.  timestamp-filtered fact scan (FULL.py:210-211)
2.  EAV option-set lookups — ``select distinct`` CTEs re-joined back
    (FULL.py:331-409, A4/D5); two lookups, broadcast
3.  multi-way LEFT star enrichment, dims broadcast (FULL.py:411-475, J1)
4.  wide-column drop (FULL.py:510-593 drops ~280 cols; here the dim
    payload columns)
5.  coalesce defaults for unmatched dims (FULL.py:497-500)
6.  CASE/WHEN bucket remap (FULL.py:420-434)
7.  window top-1 per group — newest order per customer (FULL.py:744)
8.  response-array construction — array<struct> question/answer document,
    serialized to JSON (FULL.py:653-699)
9.  ``checkpoint_stage`` lineage break at the fan-out point
    (OUTBOUND.py:227-229, K2) — the downstream double-waterfall re-reads
    this stage twice; without the break the whole 8-stage prefix would be
    analyzed and executed once per branch
10. branch split on the remapped bucket (FULL.py's sales vs TV branches)
11. sales-branch waterfall fallback join, 2 tiers + defaults
    (FULL.py:738-942, J4+J5)
12. TV-branch waterfall with its own dim restrictions (FULL.py:950-1057)
13. ``unionByName`` of the branches (FULL.py:1061, U1)
14. aggregate self-join with suffixed columns — per-nation average joined
    back (FULL.py:1171-1194 self-join shape, J7)
15. global sequential surrogate key (FULL.py:413, W1)
16. formatted-date rendering (FULL.py:1346-1347, F10)
17. final narrow select (FULL.py:1352-1439, P1)

Scale notes (100 TB): the only shuffles are the top-1 window's hash
partition, the per-branch fallback cascades' (broadcast, no fact
shuffle) and the final global row_number — which runs on post-top-1,
post-reduction rows, the reference's own documented single-task hazard
with the scalable twin in ``operators.surrogate``. The checkpoint is a
parquet write+re-scan, so branch re-reads cost one scan each instead of
re-executing the prefix.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import FallbackTier, fallback_join
from ..session import tune
from ..sources import checkpoint_stage, read_table


def _stage_path(spark: SparkSession, name: str) -> str:
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    return os.path.join(warehouse, "_staged_results", name)


def _dealer_waterfall(
    leads: DataFrame, dim: DataFrame, tiers: list[FallbackTier]
) -> DataFrame:
    return fallback_join(
        leads,
        dim,
        tiers,
        order_cols=[F.col("dealer_bal").desc(), F.col("dealer_key").desc()],
        defaults={
            "dealer_key": F.lit(-1).cast("long"),
            "dealer_name": F.lit("NA"),
            "dealer_bal": F.lit(0.0),
            "dealer_nk": F.lit(-1).cast("long"),
        },
        matched_probe="dealer_name",
        tier_col="matched_tier",
    )


def deep_prospect_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)

    # Stages 1-8 as ONE SQL statement (r16, guide §7.3 / the r15 verdict's
    # "assemble as a single SQL string" option): the chained-DataFrame
    # form re-ran the Catalyst analyzer over the whole growing
    # pre-checkpoint tree once per op (~19 full-tree analyses before the
    # staging write) — profiled at ~1 s of pure driver time at sf0.1. One
    # spark.sql() call parses and analyzes the prefix exactly once and
    # costs a handful of py4j round-trips. Expression-for-expression the
    # same plan as the DataFrame form it replaces (direct parquet file
    # relations, BROADCAST hints on every dim, CTEs inline), and the
    # oracle hash pins the results:
    # 1. timestamp-filtered fact scan
    # 2. EAV option-set lookups — distinct CTEs over the fact itself
    # 3. multi-way LEFT star enrichment, dims broadcast
    # 4. wide-column drop (the narrow projection below; the reference
    #    drops ~280 leadbase columns)
    # 5-6. coalesce defaults + CASE bucket remap
    # 7. top-1 per customer (newest order, orderkey tiebreaker)
    # 8. response-array document (all leaves coalesced → Spark/DuckDB
    #    to_json byte-identical, same pattern as nested_document_json)
    def _pq(name: str) -> str:
        return "parquet.`" + os.path.join(sf_dir, f"{name}.parquet") + "`"

    doc_stage = spark.sql(f"""
WITH fact AS (
    SELECT * FROM {_pq("orders")}
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
), prio_lookup AS (
    SELECT DISTINCT o_orderpriority AS prio_value,
           substring(o_orderpriority, 1, 1) AS prio_code
    FROM fact
), status_lookup AS (
    SELECT DISTINCT o_orderstatus AS status_value,
           CASE WHEN o_orderstatus = 'F' THEN 'FULFILLED'
                WHEN o_orderstatus = 'O' THEN 'OPEN'
                ELSE 'PENDING' END AS status_label
    FROM fact
), shaped AS (
    SELECT /*+ BROADCAST(c), BROADCAST(n), BROADCAST(r),
               BROADCAST(p), BROADCAST(s) */
           f.o_orderkey, f.o_custkey, f.o_orderdate, f.o_totalprice,
           coalesce(c.c_name, 'NA')        AS customer_name,
           coalesce(c.c_mktsegment, 'NA')  AS segment,
           coalesce(n.n_name, 'NA')        AS nation_name,
           coalesce(c.c_nationkey, -1)     AS cust_nk,
           coalesce(r.r_name, 'NA')        AS region_name,
           coalesce(p.prio_code, '0')      AS prio_code,
           coalesce(s.status_label, 'NA')  AS status_label,
           CASE WHEN f.o_totalprice < 50000  THEN 'LOW'
                WHEN f.o_totalprice < 150000 THEN 'MEDIUM'
                ELSE 'HIGH' END             AS price_bucket,
           row_number() OVER (
               PARTITION BY f.o_custkey
               ORDER BY f.o_orderdate DESC, f.o_orderkey DESC) AS __rn
    FROM fact f
    LEFT JOIN {_pq("customer")} c ON f.o_custkey = c.c_custkey
    LEFT JOIN {_pq("nation")} n   ON c.c_nationkey = n.n_nationkey
    LEFT JOIN {_pq("region")} r   ON n.n_regionkey = r.r_regionkey
    LEFT JOIN prio_lookup p       ON f.o_orderpriority = p.prio_value
    LEFT JOIN status_lookup s     ON f.o_orderstatus = s.status_value
)
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, customer_name,
       segment, nation_name, cust_nk, region_name, prio_code,
       status_label, price_bucket,
       to_json(array(
           named_struct('questionId', 'QM001', 'answer', segment),
           named_struct('questionId', 'QM002', 'answer', price_bucket),
           named_struct('questionId', 'QM003', 'answer', prio_code)
       )) AS interests_json
FROM shaped WHERE __rn = 1
""")

    # 9. lineage break before the branch fan-out
    staged = checkpoint_stage(
        doc_stage, _stage_path(spark, "deep_pipeline_stage")
    )

    # 10. branch split (reference: sales vs TV lead sources)
    sales_leads = staged.where(F.col("price_bucket") != "HIGH")
    tv_leads = staged.where(F.col("price_bucket") == "HIGH")

    dim = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("dealer_key"),
        F.col("s_name").alias("dealer_name"),
        F.col("s_acctbal").alias("dealer_bal"),
        F.col("s_nationkey").alias("dealer_nk"),
    )

    # 11. sales waterfall: strict balance tier, then any same-nation dealer
    sales = _dealer_waterfall(
        sales_leads,
        dim,
        [
            FallbackTier(
                condition=lambda f, d: f["cust_nk"] == d["dealer_nk"],
                dim_filter=F.col("dealer_bal") >= 5000,
                name="sales_premium",
                equi_on=("cust_nk", "dealer_nk"),
            ),
            FallbackTier(
                condition=lambda f, d: f["cust_nk"] == d["dealer_nk"],
                name="sales_standard",
                equi_on=("cust_nk", "dealer_nk"),
            ),
        ],
    ).withColumn("branch", F.lit("sales"))

    # 12. TV waterfall: its own dim restrictions (the reference's branches
    # differ exactly here — dealertype filters per branch)
    tv = _dealer_waterfall(
        tv_leads,
        dim,
        [
            FallbackTier(
                condition=lambda f, d: f["cust_nk"] == d["dealer_nk"],
                dim_filter=(F.col("dealer_bal") >= 8000)
                & (F.col("dealer_key") % 2 == 0),
                name="tv_premium",
                equi_on=("cust_nk", "dealer_nk"),
            ),
            FallbackTier(
                condition=lambda f, d: f["cust_nk"] == d["dealer_nk"],
                dim_filter=F.col("dealer_bal") >= 0,
                name="tv_standard",
                equi_on=("cust_nk", "dealer_nk"),
            ),
        ],
    ).withColumn("branch", F.lit("tv"))

    # 13. union of the branches
    unioned = sales.unionByName(tv)

    # 14. aggregate self-join with suffixed columns: per-nation average
    # lead value from the SAME staged frame, joined back. The mean runs in
    # EXACT integer cents (half-up division), not round(avg(double), 2):
    # a nation's price sum lands exactly on .xx5 in this fixture, where
    # the float avg is within one ulp of the half-point — Spark's own
    # partial-agg order then flips the rounded value BETWEEN RUNS (the
    # hourly_buckets lesson; this was a run-order-dependent parity flake)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    nation_avg = (
        staged.groupBy(F.col("cust_nk").alias("avg_nk"))
        .agg(F.sum(cents).alias("__s"), F.count("o_totalprice").alias("__n"))
        .select(
            "avg_nk",
            (
                F.expr("(2 * __s + __n) DIV (2 * __n)").cast("double") / 100
            ).alias("nation_avg_price"),
        )
    )
    enriched = unioned.join(
        F.broadcast(nation_avg), unioned.cust_nk == nation_avg.avg_nk, "left"
    ).drop("avg_nk")

    # 15-17. surrogate key, date formatting, final narrow select
    wk = Window.orderBy("o_orderkey")
    return enriched.select(
        F.concat(
            F.lit("DP"), F.lpad(F.row_number().over(wk).cast("string"), 9, "0")
        ).alias("prospect_id"),
        F.col("o_orderkey").alias("leadid"),
        "customer_name",
        "segment",
        "nation_name",
        "region_name",
        "prio_code",
        "status_label",
        "price_bucket",
        "branch",
        "matched_tier",
        "dealer_key",
        "dealer_name",
        "dealer_bal",
        "nation_avg_price",
        F.col("o_totalprice").alias("total_price"),
        F.date_format("o_orderdate", "dd/MM/yyyy").alias("order_date_fmt"),
        "interests_json",
    )


DEEP_PIPELINE_ORACLE = """
WITH fact AS (
    SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
), prio_lookup AS (
    SELECT DISTINCT o_orderpriority AS prio_value,
           substr(o_orderpriority, 1, 1) AS prio_code
    FROM fact
), status_lookup AS (
    SELECT DISTINCT o_orderstatus AS status_value,
           CASE WHEN o_orderstatus = 'F' THEN 'FULFILLED'
                WHEN o_orderstatus = 'O' THEN 'OPEN'
                ELSE 'PENDING' END AS status_label
    FROM fact
), shaped AS (
    SELECT f.o_orderkey, f.o_custkey, f.o_orderdate, f.o_totalprice,
           coalesce(c.c_name, 'NA')        AS customer_name,
           coalesce(c.c_mktsegment, 'NA')  AS segment,
           coalesce(n.n_name, 'NA')        AS nation_name,
           coalesce(c.c_nationkey, -1)     AS cust_nk,
           coalesce(r.r_name, 'NA')        AS region_name,
           coalesce(p.prio_code, '0')      AS prio_code,
           coalesce(s.status_label, 'NA')  AS status_label,
           CASE WHEN f.o_totalprice < 50000  THEN 'LOW'
                WHEN f.o_totalprice < 150000 THEN 'MEDIUM'
                ELSE 'HIGH' END             AS price_bucket
    FROM fact f
    LEFT JOIN customer c      ON f.o_custkey = c.c_custkey
    LEFT JOIN nation n        ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r        ON n.n_regionkey = r.r_regionkey
    LEFT JOIN prio_lookup p   ON f.o_orderpriority = p.prio_value
    LEFT JOIN status_lookup s ON f.o_orderstatus = s.status_value
), staged AS (
    SELECT *,
           to_json([
               struct_pack(questionId := 'QM001', answer := segment),
               struct_pack(questionId := 'QM002', answer := price_bucket),
               struct_pack(questionId := 'QM003', answer := prio_code)
           ]) AS interests_json
    FROM shaped
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
), dim AS (
    SELECT DISTINCT s_suppkey AS dealer_key, s_name AS dealer_name,
           s_acctbal AS dealer_bal, s_nationkey AS dealer_nk
    FROM supplier
),
-- per-join-key top-1 reductions of the dim, one per tier (equi fast path)
d_sales1 AS (
    SELECT * FROM dim WHERE dealer_bal >= 5000
    QUALIFY row_number() OVER (
        PARTITION BY dealer_nk ORDER BY dealer_bal DESC, dealer_key DESC
    ) = 1
), d_sales2 AS (
    SELECT * FROM dim
    QUALIFY row_number() OVER (
        PARTITION BY dealer_nk ORDER BY dealer_bal DESC, dealer_key DESC
    ) = 1
), d_tv1 AS (
    SELECT * FROM dim WHERE dealer_bal >= 8000 AND dealer_key % 2 = 0
    QUALIFY row_number() OVER (
        PARTITION BY dealer_nk ORDER BY dealer_bal DESC, dealer_key DESC
    ) = 1
), d_tv2 AS (
    SELECT * FROM dim WHERE dealer_bal >= 0
    QUALIFY row_number() OVER (
        PARTITION BY dealer_nk ORDER BY dealer_bal DESC, dealer_key DESC
    ) = 1
),
sales_t1 AS (
    SELECT l.*, d.dealer_key, d.dealer_name, d.dealer_bal, d.dealer_nk
    FROM (SELECT * FROM staged WHERE price_bucket <> 'HIGH') l
    LEFT JOIN d_sales1 d ON l.cust_nk = d.dealer_nk
),
sales_m1 AS (SELECT *, 'sales_premium' AS matched_tier FROM sales_t1
             WHERE dealer_name IS NOT NULL),
sales_u1 AS (SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                    customer_name, segment, nation_name, cust_nk, region_name,
                    prio_code, status_label, price_bucket, interests_json
             FROM sales_t1 WHERE dealer_name IS NULL),
sales_t2 AS (
    SELECT u.*, d.dealer_key, d.dealer_name, d.dealer_bal, d.dealer_nk
    FROM sales_u1 u LEFT JOIN d_sales2 d ON u.cust_nk = d.dealer_nk
),
sales_m2 AS (SELECT *, 'sales_standard' AS matched_tier FROM sales_t2
             WHERE dealer_name IS NOT NULL),
sales_def AS (
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, customer_name,
           segment, nation_name, cust_nk, region_name, prio_code,
           status_label, price_bucket, interests_json,
           CAST(-1 AS BIGINT) AS dealer_key, 'NA' AS dealer_name,
           0.0 AS dealer_bal, CAST(-1 AS BIGINT) AS dealer_nk,
           'default' AS matched_tier
    FROM sales_t2 WHERE dealer_name IS NULL
),
tv_t1 AS (
    SELECT l.*, d.dealer_key, d.dealer_name, d.dealer_bal, d.dealer_nk
    FROM (SELECT * FROM staged WHERE price_bucket = 'HIGH') l
    LEFT JOIN d_tv1 d ON l.cust_nk = d.dealer_nk
),
tv_m1 AS (SELECT *, 'tv_premium' AS matched_tier FROM tv_t1
          WHERE dealer_name IS NOT NULL),
tv_u1 AS (SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                 customer_name, segment, nation_name, cust_nk, region_name,
                 prio_code, status_label, price_bucket, interests_json
          FROM tv_t1 WHERE dealer_name IS NULL),
tv_t2 AS (
    SELECT u.*, d.dealer_key, d.dealer_name, d.dealer_bal, d.dealer_nk
    FROM tv_u1 u LEFT JOIN d_tv2 d ON u.cust_nk = d.dealer_nk
),
tv_m2 AS (SELECT *, 'tv_standard' AS matched_tier FROM tv_t2
          WHERE dealer_name IS NOT NULL),
tv_def AS (
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, customer_name,
           segment, nation_name, cust_nk, region_name, prio_code,
           status_label, price_bucket, interests_json,
           CAST(-1 AS BIGINT) AS dealer_key, 'NA' AS dealer_name,
           0.0 AS dealer_bal, CAST(-1 AS BIGINT) AS dealer_nk,
           'default' AS matched_tier
    FROM tv_t2 WHERE dealer_name IS NULL
),
unioned AS (
    SELECT *, 'sales' AS branch FROM sales_m1
    UNION ALL SELECT *, 'sales' FROM sales_m2
    UNION ALL SELECT *, 'sales' FROM sales_def
    UNION ALL SELECT *, 'tv' FROM tv_m1
    UNION ALL SELECT *, 'tv' FROM tv_m2
    UNION ALL SELECT *, 'tv' FROM tv_def
),
nation_avg AS (
    -- exact integer-cents half-up mean; see the Spark side for why a
    -- float avg+round is not even run-to-run stable here
    SELECT cust_nk AS avg_nk,
           CAST((2 * sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 + count(o_totalprice)) // (2 * count(o_totalprice))
                AS DOUBLE) / 100 AS nation_avg_price
    FROM staged GROUP BY 1
)
SELECT concat('DP', lpad(CAST(row_number() OVER (ORDER BY u.o_orderkey)
                              AS VARCHAR), 9, '0')) AS prospect_id,
       u.o_orderkey AS leadid,
       u.customer_name, u.segment, u.nation_name, u.region_name,
       u.prio_code, u.status_label, u.price_bucket, u.branch,
       u.matched_tier, u.dealer_key, u.dealer_name, u.dealer_bal,
       a.nation_avg_price,
       u.o_totalprice AS total_price,
       strftime(u.o_orderdate, '%d/%m/%Y') AS order_date_fmt,
       u.interests_json
FROM unioned u LEFT JOIN nation_avg a ON u.cust_nk = a.avg_nk
"""


REGISTRY = [
    ("deep_prospect_pipeline", deep_prospect_pipeline, DEEP_PIPELINE_ORACLE),
]
