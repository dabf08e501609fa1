"""Data-layout optimization: Z-order (Morton) clustered writes.

Why it matters at 100 TB: parquet scans prune row groups / files by
min-max statistics, but sorting by ONE column destroys locality on every
other column. Interleaving the bits of several columns' rank codes (the
Z-order curve — the same layout Delta's OPTIMIZE ZORDER BY and Iceberg's
sort-order rewrite use) keeps every file's min-max range narrow on ALL
the interleaved columns at once, so selective filters on any of them
skip most files. Everything here is JVM-side bit arithmetic + one range
repartition — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(col: Column, cmin: float, cmax: float, bits: int) -> Column:
    """Linear-scale a numeric column into [0, 2^bits) as a long (rank code).
    Degenerate ranges (min == max) collapse to 0."""
    span = float(cmax) - float(cmin)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(cmin))) / F.lit(span)
    top = (1 << bits) - 1
    return F.least(
        F.floor(scaled * F.lit(float(1 << bits))).cast("long"), F.lit(top)
    )


def zorder_key(codes: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each rank code into one Morton key —
    pure shift/mask expressions, whole-stage-codegen friendly."""
    n = len(codes)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(codes):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of ``cols``:
    one stats pass (min/max per column, a single tiny aggregate), rank
    codes + Morton key as codegen expressions, ``repartitionByRange`` on
    the key (sampled range exchange — the same mechanism as a global
    sort, minus the per-partition sort we don't need for file-level
    stats), and a final sortWithinPartitions so row-group stats within
    each file are tight too."""
    stats = df.agg(
        *[F.min(c).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    ).first()
    codes = [
        _scale_to_bits(F.col(c), stats[f"__mn_{i}"], stats[f"__mx_{i}"], bits)
        for i, c in enumerate(cols)
    ]
    keyed = df.withColumn("__z", zorder_key(codes, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
