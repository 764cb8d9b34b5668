"""End-to-end outbound job: incremental anti-join → document assembly →
partitioned write → reconcile — mirrors OUTBOUND.py's job lifecycle."""

from __future__ import annotations

import tempfile

from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.outbound import outbound_pipeline


def test_outbound_incremental_runs(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        # First run: everything is new, write + reconcile passes.
        summary1 = outbound_pipeline(spark, sf_dir, tmp, job_run_id="run1").collect()[0]
        assert summary1.reconciled
        assert summary1.src_count > 0

        # Second run over the same source: nothing new (pure incremental).
        summary2 = outbound_pipeline(spark, sf_dir, tmp, job_run_id="run2").collect()[0]
        assert summary2.reconciled
        assert summary2.src_count == 0
