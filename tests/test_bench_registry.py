"""Import-time consistency between bench.py and the registry: a typo'd
bench name would otherwise only fail inside the driver's bench run."""

from __future__ import annotations


def test_bench_queries_resolve():
    import bench

    from glue_job_to_write_structured_data_on_s3_full_code_spark.registry import QUERIES

    extra = bench._extra_bench()
    missing = [
        n for n in bench.BENCH_QUERIES if n not in QUERIES and n not in extra
    ]
    assert not missing, f"bench names not in registry: {missing}"
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)
