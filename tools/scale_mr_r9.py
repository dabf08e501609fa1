"""Scale measurement for the r9 operators: MATCH_RECOGNIZE (the
applyInPandas CEP path) and DDSketch build+quantiles, at 1x/16x/64x
events with disjoint user ids (per-key history constant, key count
grows — the shape a 100 TB event lake has). Run:
python tools/scale_mr_r9.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blazingsql_spark.functions import sketches
from blazingsql_spark.operators.match_recognize import match_recognize
from blazingsql_spark.queries.registry import load_table
from blazingsql_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OFF = 10_000_000


def replicate(df, id_cols, reps):
    r = df.sparkSession.range(reps).select(F.col("id").alias("__r"))
    out = df.crossJoin(r)
    for c in id_cols:
        out = out.withColumn(c, F.col(c) + F.col("__r") * OFF)
    return out.drop("__r")


def bench(name, build):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.2f} s", flush=True)
    return best


def main():
    spark = get_spark(master="local[32]")
    ev1 = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    define = {
        "V": "event_type = 'view'",
        "C": "event_type = 'click'",
        "P": "event_type = 'purchase'",
    }

    def mr(ev):
        return match_recognize(
            ev, ["user_id"], ["ts", "event_id"],
            [("COUNT(*)", "n"), ("FIRST(ts)", "first_ts")],
            "V C+ P", define,
        )

    def dd(ev):
        sk = sketches.ddsketch_build(
            ev.select(F.col("event_id").cast("double").alias("v")), "v"
        )
        return sketches.ddsketch_quantiles(sk, [0.5, 0.99])

    for reps in (1, 16, 64):
        ev = (
            ev1
            if reps == 1
            else replicate(ev1, ["user_id", "event_id"], reps).localCheckpoint(
                eager=True
            )
        )
        n = ev.count()
        t_mr = bench(f"match_recognize {reps}x ({n} rows)", lambda: mr(ev))
        t_dd = bench(f"ddsketch {reps}x", lambda: dd(ev))
        print(f"== reps={reps}: mr {t_mr:.2f} s, ddsketch {t_dd:.2f} s", flush=True)


if __name__ == "__main__":
    main()
