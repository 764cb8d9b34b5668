"""The __main__ CLI drives the registry and the structuring job without
writing Python — pin its contract in-process (get_spark reuses the active
test session, so no extra JVM spins up)."""

from __future__ import annotations

from glue_job_to_write_structured_data_on_s3_full_code_spark.__main__ import main


def test_cli_list_filters_and_marks_oracles(capsys, spark):
    assert main(["list", "--filter", "dedup"]) == 0
    out = capsys.readouterr().out
    assert "dedup_exact\toracled" in out
    assert "pricing_summary_agg" not in out


def test_cli_run_explain_prints_plan(capsys, spark, sf_dir):
    assert main(["run", "dedup_exact", "--sf-dir", sf_dir, "--explain"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out


def test_cli_run_writes_parquet(capsys, spark, sf_dir, tmp_path):
    target = str(tmp_path / "out")
    assert main(["run", "dedup_exact", "--sf-dir", sf_dir, "--output", target]) == 0
    n = spark.read.parquet(target).count()
    assert n > 0
    assert f"wrote {n} rows" in capsys.readouterr().out


def test_cli_unknown_query_suggests(capsys, spark):
    assert main(["run", "dedup_exac"]) == 2
    err = capsys.readouterr().err
    assert "unknown query" in err and "dedup_exact" in err


def test_cli_job_end_to_end(capsys, spark, sf_dir, tmp_path):
    target = str(tmp_path / "warehouse_tbl")
    assert (
        main(
            [
                "job",
                "--sf-dir", sf_dir,
                "--target", target,
                "--dataset-date", "2024-03-01",
                "--table", "cli_test_structured",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "2024-03-01" in out
    spark.sql("DROP TABLE IF EXISTS cli_test_structured")
