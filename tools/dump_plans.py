"""Regenerate named query sections of PLANS.md from live
`.explain("formatted")` output at sf0.001, so plan quality stays
reviewable without running Spark.

Usage: python tools/dump_plans.py name1 name2 ...
Replaces each existing `## name` section in place (or appends missing
ones at the end).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: dump_plans.py name [name ...]")
        return 2

    from blazingsql_spark.queries.registry import all_queries
    from blazingsql_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", master="local[4]")
    specs = all_queries()
    path = os.path.join(REPO, "PLANS.md")
    text = open(path).read()
    for name in names:
        df = specs[name].fn(spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # control chars from plan literals (e.g. match_recognize's NUL
        # classification sentinel) would make PLANS.md a binary file
        plan = "".join(
            ch if ch.isprintable() or ch in "\n\t" else f"\\x{ord(ch):02x}"
            for ch in plan
        )
        section = f"## {name}\n\n```\n{plan.rstrip()}\n```\n"
        pat = re.compile(rf"## {re.escape(name)}\n.*?(?=\n## |\Z)", re.S)
        if pat.search(text):
            # lambda replacement: plan text contains backslashes that the
            # template parser would treat as escapes
            text = pat.sub(lambda _m: section.rstrip() + "\n", text)
            print(f"replaced: {name}")
        else:
            text = text.rstrip() + "\n\n" + section
            print(f"appended: {name}")
    open(path, "w").write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
