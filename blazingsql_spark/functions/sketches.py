"""Mergeable frequency sketches — approximate heavy hitters with bounded
memory.

The exact top-k path (groupBy → count → TakeOrdered, `vocab_topk`) shuffles
one row per distinct key; at 100 TB with billions of distinct keys that is
itself a heavy job. The sketch path bounds state to ``capacity`` counters
per partition regardless of cardinality — the space-saving summary
(Metwally et al., "Efficient computation of frequent and top-k elements in
data streams"): admit new items by absorbing the minimum counter, so any
item with true frequency > N/capacity is guaranteed present, with
overcount ≤ the absorbed minimum. Summaries are mergeable (sum matching
counters, re-trim) — the map-side is `mapInPandas` with vectorized
per-batch value_counts folded into the counter set; the reduce side is a
tiny groupBy over ≤ capacity × partitions rows.

Complements the other sketches already in the engine: HLL++ distinct
(`agg_approx_distinct`), approximate percentile (`agg_approx_percentile`),
MinHash/SimHash signatures (dedup), PQ codes (ANN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def space_saving_topk(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = 256,
) -> DataFrame:
    """Approximate top-``k`` of ``df[col]`` by frequency with at most
    ``capacity`` counters of state per partition. Returns (item, est)
    with est >= true count (space-saving overcounts, never undercounts,
    for items it retains). Guarantee: any item with true frequency
    > N_partition/capacity survives its partition's summary; the merge
    keeps all surviving counters, so set-membership verdicts thresholded
    well above N/capacity are deterministic even though exact ``est``
    values depend on partitioning.

    Ties during eviction resolve by (count, item) — deterministic for a
    fixed partitioning."""
    import pandas as pd

    cap = int(capacity)

    def sketch_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[col].astype(str).value_counts()
            # deterministic fold order: big first, then lexicographic
            items = sorted(vc.items(), key=lambda t: (-t[1], t[0]))
            for item, cnt in items:
                cnt = int(cnt)
                if item in counters:
                    counters[item] += cnt
                elif len(counters) < cap:
                    counters[item] = cnt
                else:
                    evict, emin = min(
                        counters.items(), key=lambda t: (t[1], t[0])
                    )
                    del counters[evict]
                    counters[item] = emin + cnt
        if counters:
            yield pd.DataFrame(
                {"item": list(counters.keys()), "est": list(counters.values())}
            )

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        sketch_partition, "item string, est long"
    )
    merged = summaries.groupBy("item").agg(F.sum("est").alias("est"))
    return merged.orderBy(F.col("est").desc(), "item").limit(k)


def cms_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Mergeable count-min sketch (Cormode & Muthukrishnan 2005) over
    ``df[col]``: ``depth`` hash rows of ``width`` counters. Each
    partition reduces to one depth x width matrix (bounded state,
    cardinality-independent) emitted as sparse (j, w, c) rows; the merge
    is a groupBy element-wise sum — so shards/days can be sketched
    independently and combined, the same contract as the HLL rollup.
    Hashing is md5-derived and seed-fixed: the sketch is deterministic
    for a given dataset, and estimates NEVER undercount."""
    import hashlib

    import numpy as np
    import pandas as pd

    wd, dp = int(width), int(depth)

    def sketch_partition(batches):
        m = np.zeros((dp, wd), dtype=np.int64)
        for pdf in batches:
            # NULLs are excluded, not counted as the string 'None'/'nan'
            # (same contract as categorical_fit — count nulls upstream if
            # they are a category)
            vc = pdf[col].dropna().astype(str).value_counts()
            for item, cnt in vc.items():
                for j in range(dp):
                    h = int.from_bytes(
                        hashlib.md5(f"{j}:{item}".encode()).digest()[:8], "big"
                    )
                    m[j, h % wd] += int(cnt)
        js, ws = np.nonzero(m)
        if len(js):
            yield pd.DataFrame({"j": js, "w": ws, "c": m[js, ws]})

    parts = df.select(col).mapInPandas(sketch_partition, "j int, w int, c long")
    return parts.groupBy("j", "w").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    items: list[str],
    width: int = 1024,
    depth: int = 4,
) -> dict[str, int]:
    """Point-query a ``cms_sketch``: min over the depth rows of the
    hashed counter — an upper bound on the true count, within
    e*N/width of it with probability 1-(1/e)^depth. The collect is the
    sketch itself (<= depth*width rows by construction), never data."""
    import hashlib

    import numpy as np

    wd, dp = int(width), int(depth)
    m = np.zeros((dp, wd), dtype=np.int64)
    for r in sketch.collect():
        m[r["j"], r["w"]] = r["c"]
    out = {}
    for item in items:
        out[item] = int(
            min(
                m[
                    j,
                    int.from_bytes(
                        hashlib.md5(f"{j}:{item}".encode()).digest()[:8], "big"
                    )
                    % wd,
                ]
                for j in range(dp)
            )
        )
    return out
