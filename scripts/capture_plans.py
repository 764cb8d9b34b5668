"""Capture .explain("formatted") for every bench query into plans/<dir>/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
       (set SPARK_GRAFT_PLANS_DIR to change the output dir; default r16)

Writes plans/<dir>/<query>_<suffix>.txt for each bench query (default: all
of bench.BENCH_QUERIES). Plans are captured at sf0.1 — the bench scale —
so Exchange counts / join strategies / PushedFilters match what the bench
times. Construction-time stages (eager checkpoints) execute during plan
construction; their plans are observed via the session stage observers and
appended to the same file so nothing hides behind a lineage break.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glue_job_to_write_structured_data_on_s3_full_code_spark import session as S
from glue_job_to_write_structured_data_on_s3_full_code_spark.registry import QUERIES
import bench


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or bench.BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = S.get_spark("capture_plans")

    def explain_str(df) -> str:
        return spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    staged_plans: list[tuple[str, str]] = []
    S._STAGE_PLAN_OBSERVERS.append(
        lambda df, label: staged_plans.append((label, explain_str(df)))
    )

    for name in names:
        staged_plans.clear()
        fn = QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = explain_str(df)
        except Exception as e:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        parts = [f"== {name} ({suffix}, sf_dir={sf_dir}) ==\n", plan]
        for label, p in staged_plans:
            parts.append(f"\n== construction-time stage: {label} ==\n")
            parts.append(p)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write("\n".join(parts))
        print(f"captured {name}")


if __name__ == "__main__":
    main()
