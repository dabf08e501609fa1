"""Dump `.explain("formatted")` for queries into plans/r13/<name>_<tag>.txt.

Usage: python tools/r13_plans.py <tag> [name ...]
With no names: all headline queries. Tag is e.g. "before" or "after".
Runs at sf0.001 (plan shape, not data volume, is what's being recorded).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    if len(sys.argv) < 2:
        print("usage: r13_plans.py <tag> [name ...]")
        return 2
    tag = sys.argv[1]
    names = sys.argv[2:]

    from blazingsql_spark.queries.registry import all_queries
    from blazingsql_spark.session import get_spark

    spark = get_spark(app_name="r13_plans", master="local[4]")
    specs = all_queries()
    if not names:
        names = sorted(n for n, s in specs.items() if s.headline)
    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        plan = "".join(
            ch if ch.isprintable() or ch in "\n\t" else f"\\x{ord(ch):02x}"
            for ch in plan
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
