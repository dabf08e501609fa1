#!/usr/bin/env python
"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full computation, no driver
collect) — the same discipline as spark-sql-perf. One warmup query first
so JVM/codegen startup isn't attributed to the first measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from blazingsql_spark.queries.registry import all_queries  # noqa: E402
from blazingsql_spark.session import get_spark  # noqa: E402


def run_query(spec, spark, sf_dir: str, repeats: int = 3) -> float:
    """Best-of-N wall clock: the machine is shared, so a single run can
    absorb transient contention spikes; the min is the reproducible cost."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="blazingsql_spark_bench")

    specs = {n: s for n, s in all_queries().items() if s.headline}

    # warmup: touch the JVM, codegen, and the parquet footers once
    specs["tpch_q6"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in sorted(specs):
        timings[name] = round(run_query(specs[name], spark, sf_dir), 3)
        # drop cached/persisted intermediates (e.g. the ANN index) so later
        # queries aren't taxed by earlier queries' executor-memory residue
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
