"""Interleaved A/B of registry.fan_out (identity vs active) for named
queries, same session, bench-identical cleanup — controls for host
weather drift by alternating variants within one process.

Usage: r12_ab_fanout.py name [name ...] [--rounds N]
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 3
    for a in sys.argv[1:]:
        if a.startswith("--rounds"):
            rounds = int(a.split("=", 1)[1])

    from blazingsql_spark.queries import registry
    from blazingsql_spark.queries.registry import all_queries
    from blazingsql_spark.session import get_spark

    real_fan_out = registry.fan_out

    def no_fan_out(spark, sf_dir, name, df):
        return df

    # fan_out is imported by name into graph_ann/pipeline — patch there too
    from blazingsql_spark.queries import graph_ann, pipeline

    def set_variant(active: bool) -> None:
        f = real_fan_out if active else no_fan_out
        registry.fan_out = f
        graph_ann.fan_out = f
        pipeline.fan_out = f

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12_ab_fanout")
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

    results: dict[str, dict[str, list[float]]] = {
        n: {"on": [], "off": []} for n in args
    }
    for r in range(rounds):
        for name in args:
            spec = specs[name]
            for label, active in (("on", True), ("off", False)):
                set_variant(active)
                time_once(spec)  # warmup for this variant
                best = min(time_once(spec) for _ in range(3))
                results[name][label].append(best)
                cleanup()
    set_variant(True)
    for name in args:
        on = min(results[name]["on"])
        off = min(results[name]["off"])
        print(
            f"{name:32s} fanout_on {on:6.3f}  fanout_off {off:6.3f}  "
            f"delta {on - off:+6.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
