"""ETL-lifecycle queries: SCD Type-2 dimension merge and snapshot diff.

Both synthesize the "new snapshot" deterministically from the fixture
(modular arithmetic on the key picks the changed/absent/new rows), so the
DuckDB oracle can state the *expected semantic outcome* directly instead
of replaying the merge mechanics — a stronger check than mirroring the
implementation step-for-step.

Reference lineage: the snapshot-partitioned rebuild (FULL.py:72) and the
insert-only anti-join load (OUTBOUND.py:206-224) are the degenerate forms
of these two operators; see operators/scd.py docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.scd import scd2_merge, snapshot_diff
from ..session import tune
from ..sources import read_table

_LOAD = "2024-02-01"


def _customer_updates(cust: DataFrame) -> DataFrame:
    """New snapshot: keys ≡2 (mod 3) are absent (carried through), keys
    ≡0 (mod 7) have a changed balance, 50 brand-new keys appear."""
    base = cust.where(F.col("c_custkey") % 3 != 2).select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    new_rows = cust.where(F.col("c_custkey") <= 50).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
        F.col("c_acctbal"),
    )
    return base.unionByName(new_rows)


def customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 customer history every temporal query builds on: day-1
    snapshot as the open current state, merged with the synthesized
    update batch (_customer_updates) at ``_LOAD``. ONE definition —
    scd2_customer_merge, scd2_pointintime_read, and
    temporal_queries.scd2_temporal_enrich all consume this, so the load
    date / compare columns / update modeling can never desynchronize
    across their oracles."""
    cust = read_table(spark, sf_dir, "customer")
    current = cust.select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return scd2_merge(
        current,
        _customer_updates(cust),
        key="c_custkey",
        compare_cols=["c_name", "c_acctbal"],
        load_date=_LOAD,
    )


def scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge of a synthesized customer snapshot into a day-1 history.
    One key shuffle (the full-outer compare join); unions are free."""
    tune(spark)
    merged = customer_history(spark, sf_dir)
    # register as timestamps: the driver's canonicalizer (like pandas)
    # renders DATE and TIMESTAMP cells differently across engines
    return merged.withColumn(
        "valid_from", F.col("valid_from").cast("timestamp")
    ).withColumn("valid_to", F.col("valid_to").cast("timestamp"))


# Semantic outcome, stated directly: every original key keeps its day-1 row
# (closed iff changed); changed keys add an open v2 row; new keys appear open.
SCD2_ORACLE = f"""
WITH changed AS (
    SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 2 AND c_custkey % 7 = 0
)
SELECT c_custkey, c_name, c_acctbal,
       TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
       CASE WHEN c_custkey IN (SELECT c_custkey FROM changed)
            THEN TIMESTAMP '{_LOAD} 00:00:00' END AS valid_to
FROM customer
UNION ALL
SELECT c_custkey, c_name, c_acctbal + 100.0,
       TIMESTAMP '{_LOAD} 00:00:00', CAST(NULL AS TIMESTAMP)
FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey + 1000000, 'NEW ' || c_name, c_acctbal,
       TIMESTAMP '{_LOAD} 00:00:00', CAST(NULL AS TIMESTAMP)
FROM customer WHERE c_custkey <= 50
"""


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-diff of two order snapshots → (key, added|removed|changed).
    Unchanged rows (the 100 TB bulk) are dropped inside the operator.
    'Yesterday' is synthesized: keys ≡0 (mod 11) missing (→ added today),
    keys ≡0 (mod 13) had a different price (→ changed), 100 synthetic
    keys existed only yesterday (→ removed)."""
    tune(spark)
    orders = read_table(spark, sf_dir, "orders")
    today = orders.select("o_orderkey", "o_totalprice")
    yesterday = (
        orders.where(F.col("o_orderkey") % 11 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
        .unionByName(
            orders.where(F.col("o_orderkey") < 200).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_totalprice",
            )
        )
    )
    return snapshot_diff(
        yesterday, today, key="o_orderkey", compare_cols=["o_totalprice"]
    )


SNAPSHOT_DIFF_ORACLE = """
SELECT o_orderkey, 'added' AS status FROM orders WHERE o_orderkey % 11 = 0
UNION ALL
SELECT o_orderkey, 'changed' FROM orders
WHERE o_orderkey % 11 <> 0 AND o_orderkey % 13 = 0
UNION ALL
SELECT o_orderkey + 10000000, 'removed' FROM orders WHERE o_orderkey < 200
"""


def scd2_pointintime_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) read over the SCD2 history — the query
    side of slowly-changing dimensions: reconstruct the dimension as of
    two instants (one before, one after the load) and aggregate each
    state. `valid_from <= t < valid_to` (open = NULL) is the standard
    bitemporal band; the filter is map-side over the history, one hash
    aggregation per as-of date (both states come from ONE history scan
    via explode of the as-of list)."""
    tune(spark)
    history = customer_history(spark, sf_dir)
    as_of = F.explode(
        F.array(F.lit("2024-01-15"), F.lit("2024-02-15"))
    ).alias("as_of")
    return (
        history.select("*", as_of)
        .where(
            (F.col("valid_from") <= F.col("as_of").cast("date"))
            & (
                F.col("valid_to").isNull()
                | (F.col("valid_to") > F.col("as_of").cast("date"))
            )
        )
        .withColumn(
            "bal_cents",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long"),
        )
        .groupBy("as_of")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("bal_cents").alias("total_bal_cents"),
        )
    )


SCD2_PIT_ORACLE = f"""
WITH changed AS (
    SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 2 AND c_custkey % 7 = 0
), history AS (
    SELECT c_custkey, c_acctbal,
           DATE '2024-01-01' AS valid_from,
           CASE WHEN c_custkey IN (SELECT c_custkey FROM changed)
                THEN DATE '{_LOAD}' END AS valid_to
    FROM customer
    UNION ALL
    SELECT c_custkey, c_acctbal + 100.0, DATE '{_LOAD}', CAST(NULL AS DATE)
    FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
    UNION ALL
    SELECT c_custkey + 1000000, c_acctbal, DATE '{_LOAD}', CAST(NULL AS DATE)
    FROM customer WHERE c_custkey <= 50
), dates AS (
    SELECT unnest(['2024-01-15', '2024-02-15']) AS as_of
)
SELECT as_of, count(*) AS n_customers,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_bal_cents
FROM history, dates
WHERE valid_from <= CAST(as_of AS DATE)
  AND (valid_to IS NULL OR valid_to > CAST(as_of AS DATE))
GROUP BY as_of
"""


def gdpr_erasure_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten over an immutable parquet lake: erase every
    row of the flagged data subjects by REWRITING ONLY the partitions
    that own them, leaving all other partition files untouched.

    The table is partitioned by a key-derived bucket (``o_custkey % 8``)
    — the layout decision that makes erasure surgical: a subject's rows
    live in exactly one partition, so the delete is (1) anti-join the
    flagged keys inside the owning buckets, (2) dynamic-partition-
    overwrite just those buckets (sources/snapshot.overwrite_partition).
    Flagged subjects here are ``o_custkey % 64 == 0`` → all in bucket 0;
    the untouched-files property is pinned in
    tests/test_structuring_job.py::test_gdpr_erasure_touches_only_owning_partitions.

    Scale: the rewrite cost is proportional to the FLAGGED buckets' size,
    not the table; at 100 TB with 10⁴ buckets an erasure batch rewrites
    only the buckets its subjects hash to. Output is the post-erasure
    per-bucket audit (the deletion evidence a DPO files)."""
    import os
    import shutil
    import tempfile

    from ..sources import materialize_result, overwrite_partition

    tune(spark)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    with_bucket = orders.withColumn("bucket", F.col("o_custkey") % 8)

    work = tempfile.mkdtemp(prefix="gdpr_erasure_")
    table = os.path.join(work, "orders_by_bucket")
    try:
        with_bucket.write.partitionBy("bucket").parquet(table)
        flagged = F.col("o_custkey") % 64 == 0
        touched = (
            spark.read.parquet(table)
            .where(flagged)
            .select("bucket")
            .distinct()
        )
        retained = (
            spark.read.parquet(table)
            .join(F.broadcast(touched), "bucket", "left_semi")
            .where(~flagged)
        )
        overwrite_partition(retained, table, partition_cols=("bucket",))
        audit = (
            spark.read.parquet(table)
            .withColumn(
                "price_cents",
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"),
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_orders"),
                F.countDistinct("o_custkey").alias("n_customers"),
                F.sum("price_cents").alias("revenue_cents"),
            )
            .withColumn("bucket", F.col("bucket").cast("long"))
        )
        return materialize_result(audit, "gdpr_erasure_rewrite")
    finally:
        shutil.rmtree(work, ignore_errors=True)


GDPR_ERASURE_ORACLE = """
SELECT o_custkey % 8 AS bucket,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
WHERE o_custkey % 64 <> 0
GROUP BY 1
"""


_K_ANON = 15  # minimum group size for a releasable quasi-identifier cell


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit: k-anonymity of the customer table under
    the quasi-identifier (c_nationkey, c_mktsegment) — the check a data
    release runs BEFORE publishing: any QI cell with fewer than k members
    re-identifies its customers and must be suppressed or generalized
    (Sweeney 2002). Output: every QI cell with its size, the below-k
    flag, and the share of total rows at risk if released as-is.

    Scale: one hash aggregation over the QI columns (the cell frame is
    |nations| x |segments| regardless of row count) plus a window over
    that tiny frame for the risk share — the same shape at 100 TB.
    """
    tune(spark)
    cust = read_table(spark, sf_dir, "customer")
    cells = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("cell_size")
    )
    wall = Window.partitionBy()
    return cells.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("cell_size").cast("long").alias("cell_size"),
        (F.col("cell_size") < _K_ANON).alias("below_k"),
        F.round(
            F.sum(F.when(F.col("cell_size") < _K_ANON, F.col("cell_size")).otherwise(0)).over(wall)
            / F.sum("cell_size").over(wall),
            6,
        ).alias("at_risk_share"),
    )


K_ANONYMITY_ORACLE = f"""
WITH cells AS (
    SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS cell_size
    FROM customer GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment, cell_size,
       (cell_size < {_K_ANON}) AS below_k,
       round(sum(CASE WHEN cell_size < {_K_ANON} THEN cell_size ELSE 0 END)
                 OVER () * 1.0
             / sum(cell_size) OVER (), 6) AS at_risk_share
FROM cells
"""


REGISTRY: list[tuple] = [
    ("scd2_customer_merge", scd2_customer_merge, SCD2_ORACLE),
    ("snapshot_diff_orders", snapshot_diff_orders, SNAPSHOT_DIFF_ORACLE),
    ("gdpr_erasure_rewrite", gdpr_erasure_rewrite, GDPR_ERASURE_ORACLE),
    ("scd2_pointintime_read", scd2_pointintime_read, SCD2_PIT_ORACLE),
    ("k_anonymity_audit", k_anonymity_audit, K_ANONYMITY_ORACLE),
]
