"""Entry-point-A lifecycle: transform → partitioned write → catalog
registration → partition registration, run for two dates + one re-run."""

from __future__ import annotations

import os
import tempfile


from glue_job_to_write_structured_data_on_s3_full_code_spark.jobs import structuring_job
from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.snapshot import (
    show_partitions,
)


def test_structuring_job_two_dates_and_rerun(spark, sf_dir):
    table = "structured_prospects_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "structured")

        s1 = structuring_job(spark, sf_dir, path, "2024-01-01", table).collect()[0]
        assert s1.rows_in_partition > 0
        assert s1.n_partitions == 1

        s2 = structuring_job(spark, sf_dir, path, "2024-01-02", table).collect()[0]
        assert s2.n_partitions == 2
        assert f"dataset_date=2024-01-02" in show_partitions(spark, table)

        # idempotent re-run of date 1: same rows, same partition count
        s1b = structuring_job(spark, sf_dir, path, "2024-01-01", table).collect()[0]
        assert s1b.rows_in_partition == s1.rows_in_partition
        assert s1b.n_partitions == 2

        # the registered table serves snapshot-filtered queries
        n = (
            spark.table(table)
            .where("dataset_date = '2024-01-01'")
            .count()
        )
        assert n == s1.rows_in_partition
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ensure_table_infers_from_files_then_sync_discovers(spark, sf_dir):
    """Crawler lifecycle in isolation: schema-inference registration of a
    brand-new table, then an out-of-band partition write discovered by the
    incremental sync (the reference's crawler re-run, FULL.py:137)."""
    import pyspark.sql.functions as F

    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.snapshot import (
        ensure_table,
        sync_partitions,
    )

    table = "crawler_lifecycle_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "tbl")
        df = spark.range(5).select(
            "id", F.lit("a").alias("payload"), F.lit("2024-01-01").alias("dt")
        )
        df.write.partitionBy("dt").parquet(path)

        assert ensure_table(spark, table, path) is True  # created
        assert ensure_table(spark, table, path) is False  # already there
        # table creation discovers the partition COLUMN but registers no
        # partition VALUES — the crawler pass does that
        assert sync_partitions(spark, table, path) == ["dt=2024-01-01"]
        assert show_partitions(spark, table) == ["dt=2024-01-01"]

        # out-of-band write of a second partition: the catalog can't see
        # it until a crawler pass registers it
        df.withColumn("dt", F.lit("2024-01-02")).write.mode("append").partitionBy(
            "dt"
        ).parquet(path)
        assert sync_partitions(spark, table, path) == ["dt=2024-01-02"]
        assert sync_partitions(spark, table, path) == []  # idempotent
        assert spark.table(table).where("dt = '2024-01-02'").count() == 5
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ensure_table_empty_path_schema_fallback(spark):
    """The crawler has nothing to infer from on an empty path; ensure_table
    falls back to the writer's explicit schema (saveAsTable)."""
    table = "crawler_empty_path_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "does_not_exist_yet")
        schema_src = spark.range(1).selectExpr("id", "'x' AS payload")
        assert ensure_table_mod(spark, table, path, schema_source=schema_src) is True
        assert spark.table(table).columns == ["id", "payload"]
        assert spark.table(table).count() == 0
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ensure_table_fallback_is_partitioned_and_real_errors_reraise(spark):
    """The empty-path fallback must register the partition columns (so a
    later sync_partitions/ADD PARTITION works), and a CREATE failure that
    is NOT the empty-location condition — e.g. a bad identifier — must
    re-raise instead of being masked by the fallback."""
    import pytest
    from pyspark.errors import AnalysisException

    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.snapshot import (
        sync_partitions,
    )

    table = "crawler_partitioned_fallback_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "empty_loc")
        schema_src = spark.range(1).selectExpr(
            "id", "'x' AS payload", "'2024-01-01' AS dt"
        )
        assert (
            ensure_table_mod(
                spark, table, path, schema_source=schema_src, partition_cols=("dt",)
            )
            is True
        )
        # out-of-band partition write is discoverable => table really is
        # registered partitioned (an unpartitioned fallback would fail here)
        schema_src.write.mode("append").partitionBy("dt").parquet(path)
        assert sync_partitions(spark, table, path) == ["dt=2024-01-01"]
        spark.sql(f"DROP TABLE IF EXISTS {table}")

        # bad identifier is not the empty-location condition: re-raises
        # even though a schema_source fallback is available
        with pytest.raises(AnalysisException):
            ensure_table_mod(
                spark, "not a valid identifier!", path, schema_source=schema_src
            )


def test_sync_partitions_multi_level(spark):
    """Nested col1=v1/col2=v2 partition layouts register full multi-level
    specs (the Hadoop-FS walk recurses; a single-level listdir saw only
    the first level)."""
    import pyspark.sql.functions as F

    table = "sync_multilevel_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "tbl")
        df = spark.range(4).select(
            "id",
            F.lit("2024-01-01").alias("dt"),
            (F.col("id") % 2).cast("string").alias("shard"),
        )
        df.write.partitionBy("dt", "shard").parquet(path)
        assert ensure_table_mod(spark, table, path) is True
        assert sync_partitions(spark, table, path) == [
            "dt=2024-01-01/shard=0",
            "dt=2024-01-01/shard=1",
        ]
        assert sync_partitions(spark, table, path) == []  # idempotent
        assert spark.table(table).where("shard = '1'").count() == 2
        spark.sql(f"DROP TABLE IF EXISTS {table}")


from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.snapshot import (
    sync_partitions,
)


from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.snapshot import (
    ensure_table as ensure_table_mod,
)


def test_gdpr_erasure_touches_only_owning_partitions(spark, sf_dir, tmp_path):
    """The erasure rewrite must leave every partition that owns no flagged
    subject byte-identical on disk — the property that makes
    right-to-be-forgotten affordable on a 100 TB lake."""
    import os

    import pyspark.sql.functions as F

    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import (
        overwrite_partition,
        read_table,
    )

    table = str(tmp_path / "orders_by_bucket")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    orders.withColumn("bucket", F.col("o_custkey") % 8).write.partitionBy(
        "bucket"
    ).parquet(table)

    def snapshot_files(skip_bucket: str):
        out = {}
        for root, _dirs, files in os.walk(table):
            if skip_bucket in root:
                continue
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = snapshot_files("bucket=0")
    flagged = F.col("o_custkey") % 64 == 0
    touched = spark.read.parquet(table).where(flagged).select("bucket").distinct()
    retained = (
        spark.read.parquet(table)
        .join(F.broadcast(touched), "bucket", "left_semi")
        .where(~flagged)
    )
    overwrite_partition(retained, table, partition_cols=("bucket",))

    assert snapshot_files("bucket=0") == before  # other buckets untouched
    after = spark.read.parquet(table)
    assert after.where(flagged).count() == 0  # flagged subjects gone
    assert after.where(~flagged).count() == orders.where(~flagged).count()
