"""Pre-validated oracles for the r16 registry swap candidates.

Same staging rhythm as rounds 12→13, 13→14 and 14→15: the registry is
rotation-saturated at 200 rows, so new capabilities carry
driver-gate-shaped parity checks HERE until a swap frees slots —
registration then is a REGISTRY-entry edit plus a retirement, zero new
validation work. Each test mirrors the driver's t2 gate exactly
(``assert_parity`` = row count + sorted columns + canonical value
multiset vs DuckDB).

The two candidates close the two gaps the r14 verdict called out:
``image_thumbnail_dedup`` chains the REAL PNG codec THREE times
(encode → resize/re-encode → decode+aHash) into the image-corpus
near-dup pipeline, every stage exact integer math so the oracle replays
encode→resize→decode→hash straight from the raw bytes; and
``jdbc_partitioned_ingest`` turns the JDBC source from an
options-assembly unit test into an end-to-end write→partitioned-read
proof against a REAL in-process endpoint (embedded Apache Derby, on
every pyspark classpath).
"""

from __future__ import annotations

import pytest

from tests.parity import assert_parity

pytestmark = pytest.mark.slow  # a PNG (or three) per document + a Derby DB


def test_image_thumbnail_dedup_parity(spark, duck, sf_dir):
    """r16 candidate 1: encode → stride-2 resize (decode + re-encode) →
    decode-mode aHash → duplicate-count window, hash-verified — the gate
    row a r16 registration would add."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        IMAGE_THUMBNAIL_ORACLE,
        image_thumbnail_dedup,
    )

    assert_parity(
        image_thumbnail_dedup(spark, sf_dir),
        duck,
        IMAGE_THUMBNAIL_ORACLE,
        "image_thumbnail_dedup",
    )


def test_jdbc_partitioned_ingest_parity(spark, duck, sf_dir):
    """r16 candidate 2: events through a real JDBC write → partitioned
    read-back → rollup, hashed against the same direct-on-parquet oracle
    the file roundtrips use (any dialect type-mapping loss — long,
    microsecond timestamp, double, string — breaks the hash)."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.formats import (
        _ROLLUP_ORACLE,
        jdbc_partitioned_ingest,
    )

    assert_parity(
        jdbc_partitioned_ingest(spark, sf_dir),
        duck,
        _ROLLUP_ORACLE,
        "jdbc_partitioned_ingest",
    )


def test_jdbc_ingest_partitioned_scan_and_overwrite_lifecycle(spark, sf_dir):
    """The scale claims behind candidate 2: the read-back really is N
    concurrent range scans (8 Spark partitions covering all rows exactly
    once), and the overwrite lifecycle makes re-runs idempotent (second
    invocation returns identical rows, not doubled ones)."""
    import os

    from pyspark.sql import functions as F

    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.formats import (
        jdbc_partitioned_ingest,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.jdbc import (
        DERBY_EMBEDDED_DRIVER,
        embedded_derby_url,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.parquet import (
        read_table,
    )

    first = sorted(tuple(r) for r in jdbc_partitioned_ingest(spark, sf_dir).collect())
    # second run overwrites the same Derby table — identical result
    second = sorted(tuple(r) for r in jdbc_partitioned_ingest(spark, sf_dir).collect())
    assert first == second

    tag = os.path.basename(os.path.normpath(sf_dir))
    url = embedded_derby_url(spark, f"ingest_{tag}")
    ev = read_table(spark, sf_dir, "events")
    lo, hi, n = ev.agg(
        F.min("event_id"), F.max("event_id"), F.count("*")
    ).first()
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "EVENTS_LANDING")
        .option("driver", DERBY_EMBEDDED_DRIVER)
        .option("partitionColumn", "event_id")
        .option("lowerBound", str(lo))
        .option("upperBound", str(hi + 1))
        .option("numPartitions", "8")
        .load()
    )
    assert back.rdd.getNumPartitions() == 8
    assert back.count() == n  # range predicates tile: no loss, no overlap
