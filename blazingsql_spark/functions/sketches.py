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
            # they are a category). Stringification happened Spark-side
            # (CAST AS STRING below) so it is engine-consistent: pandas
            # astype(str) on a nullable long batch would render 0 as
            # '0.0' in null-containing partitions and '0' elsewhere.
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

    parts = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        sketch_partition, "j int, w int, c long"
    )
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


def cms_estimate_df(
    sketch: DataFrame,
    items: DataFrame,
    width: int = 1024,
    depth: int = 4,
    item_col: str = "item",
) -> DataFrame:
    """Distributed twin of :func:`cms_estimate`: point-query a
    ``cms_sketch`` for EVERY row of an items DataFrame — items hash to
    their (row, cell) coordinates in an Arrow-batched mapInPandas
    (bit-identical recipe to the build side above; keep them in
    lockstep), join the BROADCAST sketch (bounded depth*width rows by
    construction), and the min-over-rows is a groupBy. Returns
    (item, est). Use this when the item set is unbounded (e.g. a
    streaming candidate union across epochs) — cms_estimate's driver
    loop is for small fixed lists."""
    import hashlib

    import pandas as pd

    wd, dp = int(width), int(depth)

    def hash_rows(batches):
        for pdf in batches:
            # Mirror cms_sketch's normalization exactly: NULLs are
            # excluded (never hashed as the string 'None') and items are
            # stringified through the same pandas astype(str) path, so an
            # estimate hashes to the identical cell the build side wrote.
            vals = pdf[item_col].dropna().astype(str).tolist()
            yield pd.DataFrame(
                {
                    "item": [i for i in vals for _ in range(dp)],
                    "j": list(range(dp)) * len(vals),
                    "w": [
                        int.from_bytes(
                            hashlib.md5(f"{j}:{i}".encode()).digest()[:8],
                            "big",
                        )
                        % wd
                        for i in vals
                        for j in range(dp)
                    ],
                }
            )

    hashed = items.select(
        F.col(item_col).cast("string").alias(item_col)
    ).mapInPandas(hash_rows, "item string, j int, w int")
    return (
        hashed.join(F.broadcast(sketch), ["j", "w"], "left")
        .fillna(0, subset=["c"])
        .groupBy("item")
        .agg(F.min("c").alias("est"))
    )


def ddsketch_build(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """DDSketch bucket table (Masson, Rim & Lee, VLDB 2019 — Datadog's
    relative-error quantile sketch): positive values land in bucket
    ceil(log_gamma(x)) with gamma = (1+a)/(1-a), so every quantile
    estimate 2·gamma^b/(gamma+1) is within relative error ``a`` of
    the true value. NULL values carry no information and are EXCLUDED
    (a NULL-bucket row would sort first in the quantile walk and
    silently inflate n, dragging every estimate low — count nulls
    upstream if they matter). The summary is a (bucket, count) table — MERGEABLE
    by plain count addition (``ddsketch_merge``), which is the whole
    point at 100 TB: per-epoch/per-partition sketches roll up without
    rescanning, the property the engine's HLL/CMS/space-saving rows
    already have for distinct/frequency. Everything is closed-form
    column expressions (one groupBy, no UDF), so a SQL oracle can
    replay the sketch EXACTLY, not just within error.

    SIGNED values are supported via disjoint bucket codes that sort in
    value order (so the quantile walk needs no special casing):
    positives at (1<<32) + ceil(log_gamma(x)), zero at exactly 0, and a
    mirrored negative store at -(1<<32) - ceil(log_gamma(-x)) — log
    buckets span only a few thousand either way, so the three ranges
    can never collide. Returns group_cols + (bucket, cnt)."""
    a = float(relative_accuracy)
    if not 0 < a < 1:
        raise ValueError(f"relative_accuracy must be in (0,1), got {a}")
    gamma = (1.0 + a) / (1.0 - a)
    import math

    g = group_cols or []
    c = F.col(col)
    lg = F.lit(math.log(gamma))
    base = F.lit(1 << 32)
    bucket = (
        F.when(c == 0, F.lit(0))
        .when(c > 0, base + F.ceil(F.log(c) / lg))
        .otherwise(-base - F.ceil(F.log(-c) / lg))
    )
    return (
        df.filter(c.isNotNull())
        .select(*g, bucket.cast("long").alias("bucket"))
        .groupBy(*g, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def ddsketch_merge(sketch: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge sketches across their remaining grouping: sum counts per
    bucket (optionally keeping ``group_cols``). Bucket tables from ANY
    number of epochs/partitions merge exactly — addition is the whole
    merge operator."""
    g = group_cols or []
    return sketch.groupBy(*g, "bucket").agg(F.sum("cnt").alias("cnt"))


def ddsketch_quantiles(
    sketch: DataFrame,
    quantiles: list[float],
    group_cols: list[str] | None = None,
    relative_accuracy: float = 0.01,
) -> DataFrame:
    """Query quantile estimates from a bucket table: per group, walk the
    buckets in order and report the bucket whose cumulative count first
    reaches q·n, estimated at the bucket's geometric midpoint
    ±2·gamma^b/(gamma+1) (sign from the store the code falls in; the
    zero bucket → exactly 0). One window + one join — no driver-side
    walk; the window's single partition per group holds at most a few
    thousand buckets by construction (log-bounded), never the data.
    Returns group_cols + (q, est)."""
    from pyspark.sql.window import Window

    a = float(relative_accuracy)
    gamma = (1.0 + a) / (1.0 - a)
    g = group_cols or []
    w = Window.partitionBy(*[F.col(x) for x in g]).orderBy("bucket")
    cum = (
        sketch.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy(*[F.col(x) for x in g])))
    )
    qs = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    mid = F.lit(2.0 / (gamma + 1.0))
    base = F.lit(1 << 32)
    est = (
        F.when(F.col("bucket") == 0, F.lit(0.0))
        .when(
            F.col("bucket") > 0,
            mid * F.pow(F.lit(gamma), F.col("bucket") - base),
        )
        .otherwise(-mid * F.pow(F.lit(gamma), -(F.col("bucket") + base)))
    )
    return (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy(*g, "q")
        .agg(F.min("bucket").alias("bucket"))
        .select(*g, "q", est.alias("est"))
    )
