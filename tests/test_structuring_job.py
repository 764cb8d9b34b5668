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
