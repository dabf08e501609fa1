"""Physical-plan inspection utilities.

The reference exposes its plans via ``bc.explain(sql, detail=True)``
(/root/reference/pyblazing/pyblazing/apiv2/context.py:1842) and per-kernel
logs. Here the equivalent is Catalyst's formatted explain — these helpers
parse it so tests (and humans) can assert the *scale-critical* properties:
filters pushed to the parquet scan, columns pruned, small sides broadcast,
no stray cartesian products.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet reader (row-group/page pruning at
    scale — the reference's skip-data, SkipDataProcessor.cpp:227)."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema) — column-pruning check."""
    plan = physical_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip())
    return cols


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Count of physical join operators by strategy."""
    plan = physical_plan(df, "simple")
    counts: dict[str, int] = {}
    for name in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        n = plan.count(name)
        if n:
            counts[name] = n
    return counts


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (the scale currency)."""
    return physical_plan(df, "simple").count("Exchange")


def codegen_stage_count(df: DataFrame, execute: bool = False) -> int:
    """WholeStageCodegen span count — wider spans = more JVM-fused work.

    Under AQE the pre-execution plan carries no codegen markers
    (isFinalPlan=false); pass ``execute=True`` to materialize the plan first
    and count spans in the final adaptive plan.
    """
    if execute and "isFinalPlan=false" in physical_plan(df, "simple"):
        # must be an action on THIS Dataset: df.write would plan a separate
        # QueryExecution and the original AdaptiveSparkPlan never finalizes
        df.collect()
    plan = physical_plan(df, "formatted")
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    ids |= set(re.findall(r"\*\((\d+)\)", physical_plan(df, "simple")))
    return len(ids)
