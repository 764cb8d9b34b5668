"""Command-line entry point — drive the engine the way the reference's
Glue jobs are driven (trigger → run → write), without writing Python:

    python -m glue_job_to_write_structured_data_on_s3_full_code_spark list [--filter SUBSTR]
    python -m glue_job_to_write_structured_data_on_s3_full_code_spark run QUERY \
        [--sf-dir DIR] [--output PATH] [--show N] [--explain]
    python -m glue_job_to_write_structured_data_on_s3_full_code_spark job \
        --target PATH --dataset-date YYYY-MM-DD [--sf-dir DIR]

`run` executes any registered query: `--output` writes parquet (the
reference's K1 sink), otherwise the first `--show` rows print. `--explain`
prints the formatted physical plan instead of executing — the plan-audit
loop SCALE.md documents. `job` runs the end-to-end structuring job
(entry point A: transform → snapshot stamp → partitioned overwrite →
catalog registration, FULL.py shape) against a warehouse path.
"""

from __future__ import annotations

import argparse
import os
import sys

# same data-dir override bench.py honors
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="glue_job_to_write_structured_data_on_s3_full_code_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--filter", default="", help="substring filter on names")

    rp = sub.add_parser("run", help="run one registered query")
    rp.add_argument("query")
    rp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    rp.add_argument("--output", default=None, help="write result parquet here")
    rp.add_argument("--show", type=int, default=20)
    rp.add_argument("--explain", action="store_true", help="print the plan, don't execute")

    jp = sub.add_parser("job", help="run the structuring job end-to-end")
    jp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    jp.add_argument("--target", required=True, help="warehouse path for the partitioned table")
    jp.add_argument("--dataset-date", required=True)
    jp.add_argument("--table", default="structured_prospects")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from .registry import ORACLES, QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            if args.filter in name:
                marker = "oracled" if name in ORACLES else "rows-only"
                print(f"{name}\t{marker}")
        return 0

    from .session import get_spark

    if args.cmd == "run":
        if args.query not in QUERIES:
            matches = [n for n in QUERIES if args.query in n]
            hint = f"; close matches: {', '.join(matches[:5])}" if matches else ""
            print(f"unknown query '{args.query}'{hint}", file=sys.stderr)
            return 2
        spark = get_spark(f"run-{args.query}")
        df = QUERIES[args.query](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        elif args.output:
            df.write.mode("overwrite").parquet(args.output)
            print(f"wrote {spark.read.parquet(args.output).count()} rows to {args.output}")
        else:
            df.show(args.show, truncate=False)
        return 0

    if args.cmd == "job":
        from .jobs import structuring_job

        spark = get_spark("structuring-job")
        summary = structuring_job(
            spark, args.sf_dir, args.target, args.dataset_date, table=args.table
        )
        summary.show(truncate=False)
        return 0

    return 2  # unreachable: argparse enforces a sub-command


if __name__ == "__main__":
    sys.exit(main())
