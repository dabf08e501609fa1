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
