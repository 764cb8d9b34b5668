"""Split each bench query's cost into plan-CONSTRUCTION vs EXECUTION and
count py4j commands during construction (guide §7.3 — driver-side work
the cluster never parallelizes).

Usage: python scripts/profile_construct.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glue_job_to_write_structured_data_on_s3_full_code_spark import session as S
from glue_job_to_write_structured_data_on_s3_full_code_spark.registry import QUERIES
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:] or bench.BENCH_QUERIES
    spark = S.get_spark("profile_construct")
    client = spark.sparkContext._gateway._gateway_client
    orig = client.send_command
    n_cmd = [0]

    def counted(*a, **k):
        n_cmd[0] += 1
        return orig(*a, **k)

    client.send_command = counted

    print(f"{'query':40s} {'constr_s':>9s} {'py4j':>6s} {'exec_s':>8s}")
    for name in names:
        fn = QUERIES[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        legs = []
        for _ in range(3):
            n_cmd[0] = 0
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            cmds = n_cmd[0]
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            legs.append((t1 - t0, cmds, t2 - t1))
        legs.sort()
        c, n, e = legs[1]
        print(f"{name:40s} {c:9.3f} {n:6d} {e:8.3f}", flush=True)


if __name__ == "__main__":
    main()
