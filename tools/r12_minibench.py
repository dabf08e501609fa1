"""bench.py methodology (warmup + best-of-4 + identical inter-query
cleanup) for a named subset of registry queries — the fast A/B loop for
optimization work. Usage: r12_minibench.py name [name ...]"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from blazingsql_spark.queries.registry import all_queries
    from blazingsql_spark.session import get_spark

    spark = get_spark(app_name="r12_minibench")
    specs = all_queries()
    specs["tpch_q6"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def time_once(spec):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def cleanup():
        spark.catalog.clearCache()
        gc.collect()
        try:
            it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
            while it.hasNext():
                it.next()._2().unpersist(True)
        except Exception:
            pass
        from blazingsql_spark.queries import pipeline as _pl

        _pl._IVFPQ_PREBUILT.clear()
        _pl._IVF_INT8_PREBUILT.clear()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    for name in names:
        time_once(specs[name])
        t = round(min(time_once(specs[name]) for _ in range(4)), 3)
        cleanup()
        print(f"{name:30s} {t:7.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
