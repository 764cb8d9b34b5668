"""Function-family breadth, round 2 (beyond `plans/breadth.py`): JSON
construction/parsing, the boolean/conditional/ordered-statistic aggregate
family, bucketed histograms, and deterministic mode.

Cross-engine notes baked into the oracles:

- Spark's and DuckDB's compact JSON serialization agree exactly for
  integer/string payloads (verified; doubles would not — ``1.0`` vs
  ``1``), so the suite only packs integers and strings.
- Spark `skewness`/`kurtosis` are population g1/g2; DuckDB's are sample
  G1/G2 — the oracle converts (exact algebraic identity, float-safe
  after rounding).
- ``mode()`` has engine-defined tie-breaking in BOTH engines, so the
  mode query materializes the deterministic definition (max count, ties
  to smallest value) as a window over grouped counts instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources import read_table


def json_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON breadth: construct (to_json of struct + array), extract by
    path (get_json_object), schema-parse (from_json), array length,
    object keys. All JVM expressions; the pushdown-friendly single-path
    extraction query is `events_json_extract`."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    return ev.select(
        "event_id",
        F.to_json(F.struct("user_id", "event_type")).alias("packed"),
        F.to_json(F.array("user_id", "event_id")).alias("arr_json"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
        F.from_json("props", "k long").getField("k").alias("k_parsed"),
        F.json_array_length(F.to_json(F.array("user_id", "event_id"))).alias(
            "n_arr"
        ),
        F.concat_ws(",", F.json_object_keys("props")).alias("keys_csv"),
    )


JSON_SUITE_ORACLE = """
SELECT event_id,
       CAST(to_json(struct_pack(user_id := user_id, event_type := event_type))
            AS VARCHAR) AS packed,
       CAST(to_json([user_id, event_id]) AS VARCHAR) AS arr_json,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed,
       CAST(json_array_length(to_json([user_id, event_id])) AS INT) AS n_arr,
       array_to_string(json_keys(props), ',') AS keys_csv
FROM events WHERE event_id < 3000
"""


def agg_breadth2_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-family breadth: count_if, bool_and/bool_or, interpolated
    median, population skewness/kurtosis, geometric mean (exp∘avg∘ln).
    One map-side-combined shuffle on a 2-value group key."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.count_if(F.col("l_quantity") > 25).alias("n_big_qty"),
        F.bool_and(F.col("l_extendedprice") > 0).alias("all_price_pos"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_high_disc"),
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
        F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
        F.round(F.exp(F.avg(F.log(F.lit(1.0) + F.col("l_discount")))), 6).alias(
            "geo_mean_disc_factor"
        ),
    )


# skew/kurt converted from DuckDB's sample G1/G2 to Spark's population
# g1/g2:  g1 = G1·(n-2)/sqrt(n(n-1));  g2 = (G2·(n-2)(n-3)/(n-1) - 6)/(n+1)
AGG_BREADTH2_ORACLE = """
SELECT l_linestatus,
       count(*) AS n_rows,
       CAST(count_if(l_quantity > 25) AS BIGINT) AS n_big_qty,
       bool_and(l_extendedprice > 0) AS all_price_pos,
       bool_or(l_discount > 0.09) AS any_high_disc,
       round(median(l_quantity), 6) AS med_qty,
       round(skewness(l_quantity) * (count(*) - 2)
             / sqrt(count(*) * (count(*) - 1.0)), 6) AS skew_qty,
       round((kurtosis(l_quantity) * (count(*) - 2) * (count(*) - 3)
              / (count(*) - 1.0) - 6) / (count(*) + 1.0), 6) AS kurt_qty,
       round(exp(avg(ln(1.0 + l_discount))), 6) AS geo_mean_disc_factor
FROM lineitem
GROUP BY l_linestatus
"""


def quantity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket (10 buckets over [0, 50);
    50 itself lands in the overflow bucket 11 in both engines). The
    classic data-profiling shape: one groupBy on a derived int."""
    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn(
            "bucket", F.width_bucket(F.col("l_quantity"), F.lit(0.0), F.lit(50.0), F.lit(10))
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("l_quantity"), 2).alias("min_qty"),
            F.round(F.max("l_quantity"), 2).alias("max_qty"),
        )
    )


# DuckDB lacks width_bucket; the floor formula is the same function on
# this range (lo=0, w=5, overflow clamp at n+1)
QUANTITY_HISTOGRAM_ORACLE = """
SELECT CAST(least(floor(l_quantity / 5.0) + 1, 11) AS BIGINT) AS bucket,
       count(*) AS n_rows,
       round(min(l_quantity), 2) AS min_qty,
       round(max(l_quantity), 2) AS max_qty
FROM lineitem
GROUP BY 1
"""


def deterministic_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent l_quantity per line status, ties to the smallest
    value — mode() semantics made deterministic (both engines leave
    tie-breaking undefined, so the definition is materialized as a
    grouped count + top-1 window; same two-shuffle plan a scale run
    wants, since the window input is already the small grouped table)."""
    from pyspark.sql import Window

    tune(spark)
    li = read_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_linestatus", "l_quantity").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("l_linestatus").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "l_linestatus",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )


DETERMINISTIC_MODE_ORACLE = """
SELECT l_linestatus, mode_qty, mode_count FROM (
    SELECT l_linestatus, l_quantity AS mode_qty, count(*) AS mode_count,
           row_number() OVER (PARTITION BY l_linestatus
                              ORDER BY count(*) DESC, l_quantity ASC) AS rk
    FROM lineitem
    GROUP BY l_linestatus, l_quantity
) WHERE rk = 1
"""


REGISTRY = [
    ("json_function_suite", json_function_suite, JSON_SUITE_ORACLE),
    ("agg_breadth2_suite", agg_breadth2_suite, AGG_BREADTH2_ORACLE),
    ("quantity_histogram", quantity_histogram, QUANTITY_HISTOGRAM_ORACLE),
    ("deterministic_mode", deterministic_mode, DETERMINISTIC_MODE_ORACLE),
]
