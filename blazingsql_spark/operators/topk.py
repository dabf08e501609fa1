"""Top-K per group — the window-rank idiom packaged as an operator.

At scale: row_number over (group, order) is one shuffle; Spark pushes the
rank filter into the window via WindowGroupLimit (rank-limit pushdown), so
each partition keeps only K rows per group during the sort — no full
materialization of every group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
