"""SparkSession factory and runtime tuning.

The reference job's only non-default conf is ``spark.sql.crossJoin.enabled``
(FULL.py:39, needed for its OR-condition joins). Our engine adds the
scale-minded defaults the reference leaves on the table (SURVEY.md §4):
AQE with partition coalescing and skew-join handling, a shuffle-partition
count matched to the cluster, and UTC session time so results are
deterministic across environments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to (re)apply on a live session — used both when we
# build the session ourselves and when the driver hands us one.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Reference sets this for its disjunctive (OR) theta joins, FULL.py:39.
    "spark.sql.crossJoin.enabled": "true",
    # Spark default 200 is wrong for local[32] and tiny for a real cluster;
    # at deploy time this should be ~2-3x total cores. AQE coalesces down.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent).

    Called at the top of every public query/pipeline entry point so behavior
    is identical whether the session came from :func:`get_spark` or from the
    driver harness.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf not settable at runtime on this build — skip
            pass
    return spark


def get_spark(app_name: str = "glue_job_to_write_structured_data_on_s3_full_code_spark") -> SparkSession:
    """Build (or fetch) a local session sized from the environment.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver runs bench with
    local[$SPARK_GRAFT_CPUS]); in cluster deployments the master/memory come
    from spark-submit and these builder calls are inert.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)


def spread_small_input(df):
    """Round-robin repartition to ``defaultParallelism`` ONLY when the
    input plan yields fewer partitions (r15, guide §2.4/§2.5).

    The CPU-heavy map-side operators (tokenize/shingle/hash, PNG codec,
    IVF assignment) used an unconditional ``repartition(par)`` so a small
    single-file fixture doesn't run single-threaded — but an unconditional
    round-robin repartition is a FULL PAYLOAD SHUFFLE at 100 TB, where the
    partitioned scan already provides the parallelism. This keeps the
    local-mode knob (same partition count as before on the bench fixtures)
    while making it a true no-op on an already-parallel scan: the
    partition probe is plan-side only (no job runs).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


#: Observers called with ``(df, label)`` immediately BEFORE an eager
#: lineage break executes. Empty in production (zero overhead). The
#: registry-wide plan sweeps (tests/test_plan_quality.py) install one so
#: stages that run at query-CONSTRUCTION time — whose plans vanish from
#: the DataFrame a query returns — are still audited; without this hook a
#: hazardous plan could hide behind any localCheckpoint/checkpoint_stage.
_STAGE_PLAN_OBSERVERS: list = []


def notify_stage_observers(df, label: str) -> None:
    """Report a pre-execution stage plan to any installed observers."""
    for obs in _STAGE_PLAN_OBSERVERS:
        obs(df, label)


def eager_checkpoint(df, label: str = "eager_checkpoint"):
    """``localCheckpoint(eager=True)`` with a test-observable plan.

    EVERY eager lineage break in the engine must funnel through here or
    through the parquet-staging helpers (sources/parquet.checkpoint_stage,
    materialize_result) — enforced by a grep-style test — so the plan
    sweeps see eagerly-executed stages. Semantics are identical to the
    raw call: the stage runs now, the caller gets the truncated lineage.
    """
    notify_stage_observers(df, label)
    return df.localCheckpoint(eager=True)
