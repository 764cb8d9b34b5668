"""CSV/JSON source-sink roundtrips and small-file compaction."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.compaction import (
    compact,
    dataset_bytes,
)
from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table
from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.files import (
    read_csv,
    read_json,
    write_csv,
    write_json,
)


def _assert_same_rows(a, b, key):
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0, "roundtrip changed rows"
    assert b.exceptAll(a).count() == 0


def test_csv_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    cust = read_table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_csv")
    write_csv(cust, path)
    back = read_csv(
        spark,
        path,
        schema="c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    assert back.schema == cust.schema
    _assert_same_rows(cust, back, "c_custkey")


def test_csv_requires_schema_or_infer(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_csv(spark, str(tmp_path))


def test_json_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_json")
    write_json(orders, path)
    back = read_json(
        spark,
        path,
        schema="o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    ).select(*orders.columns)
    # dtype equality (nullability flags differ between parquet and JSON reads)
    assert back.dtypes == orders.dtypes
    _assert_same_rows(orders, back, "o_orderkey")


def test_compaction_reduces_file_count_preserving_rows(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem")
    fragmented = str(tmp_path / "fragmented")
    li.repartition(32).write.parquet(fragmented)
    assert len(glob.glob(os.path.join(fragmented, "*.parquet"))) == 32

    compacted = str(tmp_path / "compacted")
    # Target sized so the measured input collapses to very few files.
    n = compact(spark, fragmented, compacted, target_file_bytes=64 * 1024 * 1024)
    files = glob.glob(os.path.join(compacted, "*.parquet"))
    assert len(files) == n < 32

    back = spark.read.parquet(compacted)
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0

    # Sizing is measured from the filesystem, not guessed.
    assert dataset_bytes(spark, fragmented) > 0


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.files import (
        read_orc,
        write_orc,
    )

    li = read_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert back.dtypes == li.dtypes
    assert back.count() == li.count()
    assert back.exceptAll(li).count() == 0
    # predicate pushdown reaches the ORC scan
    plan = (
        back.where(F.col("l_quantity") > 25)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
