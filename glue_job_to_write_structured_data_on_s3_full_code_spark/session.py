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
