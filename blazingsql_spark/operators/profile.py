"""Table profiling: per-column min/max/null/distinct statistics in ONE scan.

The reference collects exactly these stats at create_table time for
row-group skip-data (pyblazing context.py:2756 _parseMetadata; skip-data
eval engine/src/skip_data/SkipDataProcessor.cpp) — Spark's parquet reader
already uses footer min/max for pushdown, so here the same scan doubles as
a data-quality/profiling surface (the ANALYZE TABLE shape).

Scale: one wide aggregate — every column's partial min/max/count folds in
the same map pass, one tiny shuffle of a single partial row per partition;
distinct counts use HLL++ (bounded memory) with exact counts optional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Returns (column, min_v, max_v, n_nulls, n_distinct) per numeric
    column, computed in a single pass. ``exact_distinct=False`` (default)
    uses HLL++ — the only choice at 100 TB; exact mode exists for oracle
    checks and small dims."""
    numeric = {"int", "bigint", "double", "float", "smallint", "tinyint", "decimal"}
    if cols is None:
        cols = [
            name
            for name, dtype in df.dtypes
            if dtype.split("(")[0] in numeric
        ]
    n_distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            n_distinct(c).alias(f"{c}__distinct"),
        ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__min, {c}__max, {c}__nulls, {c}__distinct" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS (column, min_v, max_v, n_nulls, n_distinct)"
        )
    )


def profile_skew(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
    target_rows_per_task: int = 5_000_000,
) -> DataFrame:
    """Hot-key diagnosis for join/agg planning: the top-k heaviest keys
    with their row share and a per-key suggested salt factor
    (ceil(rows / target_rows_per_task) — 1 means no salting needed).

    This is the measurement behind operators.skew: AQE splits moderate
    skew automatically, but a single key larger than an executor needs
    explicit salting, and the decision needs numbers, not vibes. One
    partial-aggregated groupBy + a top-k cut; the total-row count rides
    the same scan via a grouping-sets-free window-less trick (sum over
    the aggregated key table, |keys| rows, not the corpus).
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("key_rows"))
    totals = counts.agg(
        F.sum("key_rows").alias("__total"), F.count("*").alias("__n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "key_rows",
            F.round(F.col("key_rows") / F.col("__total"), 6).alias("row_share"),
            F.col("__n_keys").alias("n_distinct_keys"),
            F.ceil(F.col("key_rows") / F.lit(target_rows_per_task))
            .cast("long")
            .alias("suggested_salt"),
        )
        .orderBy(F.desc("key_rows"), *key_cols)
        .limit(top_k)
    )
