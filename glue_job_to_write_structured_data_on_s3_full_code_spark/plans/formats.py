"""Landing-format roundtrip queries: prove the JSONL / CSV / ORC codec
paths end-to-end (write → re-read with an explicit schema → aggregate),
oracled against the same aggregate computed directly on the parquet
source. The reference's only non-parquet interchange is REST JSON staged
through ``spark.read.json`` (FULL.py:156-197, SURVEY §2.1 S5); raw drops
in practice arrive as CSV/JSONL, so the engine's landing path needs the
same proof parquet gets.

What the roundtrip proves: schema-first reads (never inference — an extra
full pass at 100 TB), timestamp fidelity through text formats (explicit
microsecond ``timestampFormat`` on write AND read — the default
millisecond JSON format silently truncates), and double fidelity through
CSV (Spark emits shortest-roundtrip representations).

Scale notes: the write and re-read are both executor-parallel (one file
per partition, no coalesce); the aggregate is a single map-side-combined
shuffle. ``materialize_result`` re-stages the final rows before the temp
landing dir is deleted.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources import materialize_result, read_csv, read_json, read_orc, read_table
from ..sources.files import write_csv, write_json, write_orc

_EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _rollup(ev: DataFrame) -> DataFrame:
    """The post-roundtrip aggregate: integer cents + id/ts extrema per
    event type — every column either integer-exact or order-exact, so any
    codec corruption (type flip, truncation, row loss) breaks the hash."""
    return (
        ev.withColumn(
            "value_cents", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_cents").alias("total_cents"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
            F.max("ts").alias("max_ts"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_ROLLUP_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
       min(event_id) AS min_event_id,
       max(event_id) AS max_event_id,
       max(ts) AS max_ts,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, name: str) -> DataFrame:
    tune(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    work = tempfile.mkdtemp(prefix=f"{fmt}_roundtrip_")
    land = os.path.join(work, "landing")
    try:
        if fmt == "json":
            write_json(ev, land, timestampFormat=_TS_FMT)
            back = read_json(spark, land, _EVENT_SCHEMA, timestampFormat=_TS_FMT)
        elif fmt == "csv":
            write_csv(ev, land, timestampFormat=_TS_FMT)
            back = read_csv(spark, land, _EVENT_SCHEMA, timestampFormat=_TS_FMT)
        else:
            write_orc(ev, land)
            back = read_orc(spark, land)
        return materialize_result(_rollup(back), name)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def jsonl_roundtrip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines landing files → schema-first re-read →
    rollup. Hash-equality with the direct-on-parquet oracle proves the
    JSONL codec preserves longs, doubles, strings, and microsecond
    timestamps."""
    return _roundtrip(spark, sf_dir, "json", "jsonl_roundtrip_rollup")


def csv_roundtrip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → headered CSV landing files → schema-first re-read →
    rollup; proves quoting, double shortest-roundtrip, and timestamp
    fidelity through the delimited path."""
    return _roundtrip(spark, sf_dir, "csv", "csv_roundtrip_rollup")


def orc_roundtrip_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC → re-read → rollup; the third columnar format the
    lake exchange layer speaks (binary-exact, schema carried in-file)."""
    return _roundtrip(spark, sf_dir, "orc", "orc_roundtrip_rollup")


def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift across landing batches — the lakehouse fact of life
    the reference's opaque-string partitions sidestep (SURVEY §1.1:
    partition values are strings precisely because upstream schemas
    wobble). Batch 1 lands the original orders schema; batch 2 adds a
    `channel` column. A `mergeSchema` read unifies them (old rows get
    NULL channel), and the rollup proves both the widened schema and the
    null backfill.

    Scale: mergeSchema samples footers only (no data pass); the rollup is
    one hash aggregation. Partition-dir layout mirrors a dated landing
    zone, so at 100 TB the read prunes by landing date as usual."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    old = orders.where(F.col("o_orderkey") % 2 == 0)
    new = orders.where(F.col("o_orderkey") % 2 == 1).withColumn(
        "channel",
        F.when(F.col("o_custkey") % 3 == 0, F.lit("web")).otherwise(F.lit("store")),
    )
    work = tempfile.mkdtemp(prefix="schema_evolution_")
    land = os.path.join(work, "landing")
    try:
        old.write.parquet(os.path.join(land, "batch=1"))
        new.write.parquet(os.path.join(land, "batch=2"))
        merged = spark.read.option("mergeSchema", "true").parquet(land)
        out = (
            merged.withColumn(
                "price_cents",
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"),
            )
            .groupBy(F.coalesce("channel", F.lit("unknown")).alias("channel"))
            .agg(
                F.count("*").alias("n_orders"),
                F.sum("price_cents").alias("revenue_cents"),
                F.countDistinct("o_custkey").alias("n_customers"),
            )
        )
        return materialize_result(out, "schema_evolution_merge")
    finally:
        shutil.rmtree(work, ignore_errors=True)


SCHEMA_EVOLUTION_ORACLE = """
WITH widened AS (
    SELECT o_orderkey, o_custkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 1
                THEN CASE WHEN o_custkey % 3 = 0 THEN 'web' ELSE 'store' END
                ELSE NULL END AS channel
    FROM orders
)
SELECT coalesce(channel, 'unknown') AS channel,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       count(DISTINCT o_custkey) AS n_customers
FROM widened
GROUP BY 1
"""


def jdbc_partitioned_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RDBMS landing path end-to-end over a REAL JDBC endpoint:
    events → ``spark.write.jdbc`` into an embedded Apache Derby database
    (in-process, on every pyspark classpath — see
    :func:`~..sources.jdbc.embedded_derby_url`) → re-read as N CONCURRENT
    range-partitioned JDBC scans (partitionColumn/lowerBound/upperBound/
    numPartitions — SURVEY §2.1 S3's scale knobs, the difference between
    one serial cursor and N parallel ones on the reference's 41-table
    BCP inventory) → the same rollup the file roundtrips hash. Proves
    driver resolution, dialect type mapping (long/timestamp/double/
    string through Derby and back, microsecond-exact), the overwrite
    lifecycle, and the partitioned reader — everything production JDBC
    uses except the server socket. r16 swap candidate (registry is
    rotation-saturated); parity pinned by
    tests/test_r16_swap_candidates.py.

    Scale shape: the write is executor-parallel (one INSERT stream per
    partition); the read-back is 8 concurrent range scans that land as 8
    Spark partitions feeding one map-side-combined hash aggregate. The
    min/max bound probe collects a single row. At 100 TB the URL points
    at a real warehouse server and ``numPartitions`` scales with the
    executor count; nothing else changes.
    """
    from ..sources.jdbc import DERBY_EMBEDDED_DRIVER, embedded_derby_url

    tune(spark)
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    url = embedded_derby_url(spark, f"ingest_{tag}")
    table = "EVENTS_LANDING"
    (
        ev.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_EMBEDDED_DRIVER)
        .mode("overwrite")
        .save()
    )
    # single-row bound probe (Spark's JDBC partitioner needs numeric
    # bounds; production reads them from table stats the same way)
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DERBY_EMBEDDED_DRIVER)
        .option("partitionColumn", "event_id")
        .option("lowerBound", str(lo))
        .option("upperBound", str(hi + 1))
        .option("numPartitions", "8")
        .load()
    )
    return _rollup(back)


# r13 registry swap: jsonl_roundtrip_rollup / orc_roundtrip_rollup retired
# from the driver gate (COVERAGE.md "Retire-and-swap shortlist" items 1-2 —
# three near-identical roundtrips held three gate slots; csv keeps the slot).
# Both stay implemented above and locally hash-verified every session by
# tests/test_retired_queries.py, and the full sink/source matrix is pinned
# by tests/test_formats.py.
RETIRED: list[tuple] = [
    ("jsonl_roundtrip_rollup", jsonl_roundtrip_rollup, _ROLLUP_ORACLE),
    ("orc_roundtrip_rollup", orc_roundtrip_rollup, _ROLLUP_ORACLE),
]

REGISTRY: list[tuple] = [
    ("csv_roundtrip_rollup", csv_roundtrip_rollup, _ROLLUP_ORACLE),
    ("schema_evolution_merge", schema_evolution_merge, SCHEMA_EVOLUTION_ORACLE),
]
