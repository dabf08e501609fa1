"""Local full-registry gate (VERDICT r2 worklist items 3 + 6).

The driver's CORRECTNESS_r{N}.json covers only a ~50-query prefix of the
registry, so a regression in a rotated-out query would otherwise go unseen
for a round. This script runs EVERY oracle check at sf0.001 (the same
strict compare as tests/test_oracle.py) and appends ONE summary line to
PROGRESS.jsonl::

    {"ts": ..., "kind": "local_gate", "sf": 0.001,
     "oracle_pass": N, "oracle_total": M, "fails": [...],
     "recall": {"sim_ann_pq": 1.0, ...}}

It also extracts the measured ANN recall (n_recalled / n_exact_results)
from the recall-thresholded queries so recall drift across rounds is
visible in telemetry, not just gated by the >= 0.6 boolean.

Usage:  python tools/local_gate.py  [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)



def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--progress", default=os.path.join(REPO, "PROGRESS.jsonl"))
    args = ap.parse_args()

    import duckdb

    from blazingsql_spark.queries.registry import TABLES, all_queries
    from blazingsql_spark.session import get_spark
    from tests.conftest import assert_not_vacuous, compare_frames

    spark = get_spark(app_name="local_gate", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    t0 = time.time()
    passed, fails, recall = 0, [], {}
    specs = all_queries()
    for name, spec in specs.items():
        try:
            got = spec.fn(spark, args.sf_dir).toPandas()
            if spec.oracle is None:
                # rows-only check: ran, has columns
                assert got.columns.size > 0
                passed += 1
                continue
            want = con.execute(spec.oracle).fetchdf()
            compare_frames(got, want, name)
            assert_not_vacuous(name, len(want))
            passed += 1
        except Exception as exc:  # noqa: BLE001 — record, keep going
            fails.append(name)
            print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:200]}")

    from blazingsql_spark.queries.pipeline import ann_recall_telemetry

    try:
        recall = ann_recall_telemetry(spark, args.sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(f"recall telemetry failed: {exc}")

    line = {
        "ts": time.time(),
        "kind": "local_gate",
        "sf_dir": args.sf_dir,
        "oracle_pass": passed,
        "oracle_total": len(specs),
        "fails": fails,
        "recall": recall,
        "gate_s": round(time.time() - t0, 1),
    }
    with open(args.progress, "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
