"""Scale measurement for the symbol-relative MATCH_RECOGNIZE path (the
in-automaton DEFINE scan, operators/mr_expr.py): events replicated at
1x/16x/64x with disjoint user ids (per-key history constant, key count
grows — the shape a 100 TB event lake has). The vectorized-path twin
(same pattern, budget constraint dropped) runs alongside so the Python
per-row classify overhead is measured, not guessed. Run:
python tools/scale_mr_nav.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

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
        "user_id", "event_id", "event_type", "ts", "value"
    )
    meas = [("COUNT(C.*)", "n_clicks"), ("SUM(C.value)", "cv"),
            ("FIRST(ts)", "v_ts"), ("LAST(ts)", "p_ts")]

    def mr_nav(ev):
        return match_recognize(
            ev, ["user_id"], ["ts", "event_id"], meas, "V C* P",
            {
                "V": "event_type = 'view'",
                "C": "event_type = 'click'",
                "P": "event_type = 'purchase' "
                     "AND ts <= FIRST(V.ts) + INTERVAL 8 HOUR",
            },
        )

    def mr_vec(ev):
        return match_recognize(
            ev, ["user_id"], ["ts", "event_id"], meas, "V C* P",
            {
                "V": "event_type = 'view'",
                "C": "event_type = 'click'",
                "P": "event_type = 'purchase'",
            },
        )

    reps_list = (
        tuple(int(a) for a in sys.argv[1:]) if len(sys.argv) > 1 else (1, 16, 64)
    )
    for reps in reps_list:
        ev = (
            ev1
            if reps == 1
            else replicate(ev1, ["user_id", "event_id"], reps).localCheckpoint(
                eager=True
            )
        )
        n = ev.count()
        t_nav = bench(f"mr symbol-relative {reps}x ({n} rows)", lambda: mr_nav(ev))
        t_vec = bench(f"mr vectorized twin {reps}x", lambda: mr_vec(ev))
        print(
            f"== reps={reps}: nav {t_nav:.2f} s, vec {t_vec:.2f} s, "
            f"overhead {t_nav / t_vec:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
