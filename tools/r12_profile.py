"""Split a registry query's wall time into DataFrame build (py4j),
planning (analysis+optimization+physical), and execution (noop sink).

Usage: python tools/r12_profile.py name [name ...] [--sf-dir DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from blazingsql_spark.queries.registry import all_queries
    from blazingsql_spark.session import get_spark

    spark = get_spark(app_name="r12_profile")
    specs = all_queries()
    # warm the JVM once
    specs["tpch_q6"].fn(spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in args.names:
        spec = specs[name]
        # one untimed full pass (JIT + index caches), like bench.py
        spec.fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        rows = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, t3 - t2))
            spark.catalog.clearCache()
        best = min(rows, key=lambda r: sum(r))
        print(
            f"{name:28s} build {best[0]:6.3f}  plan {best[1]:6.3f}  "
            f"exec {best[2]:6.3f}   (best-of-{args.reps} by total)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
