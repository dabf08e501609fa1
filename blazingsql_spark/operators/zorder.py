"""Z-order (Morton) clustering for multi-column data skipping.

Parquet prunes row groups by min/max statistics, but a table laid out by
one column has USELESS statistics for every other column: a range filter
on (a AND b) prunes on whichever column the sort favored and scans
everything else. Interleaving the bits of both columns into one Morton
key and range-partitioning + sorting by it gives every file a tight
bounding BOX in (a, b) space — both filters prune, the property Delta's
OPTIMIZE ZORDER BY sells, reduced to its engine-portable core: the
z-value is pure integer shift/mask arithmetic (identical in any engine,
differential-testable), and the layout step is Spark's own
repartitionByRange + sortWithinPartitions — no custom writer.

Scale shape: computing z is a map-only projection; the relayout is ONE
range exchange (the same cost as any global sort) paid once at write
time, bought back on every subsequent multi-predicate scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column (caller
    normalizes to non-negative ints that fit ``bits`` — e.g. pmod by
    2^bits, or rank-bucket skewed columns first). Bit i of column j lands
    at output position i*k + j, so k columns × ``bits`` bits fill the low
    k·bits bits of one BIGINT. k·bits must stay ≤ 63."""
    k = len(cols)
    assert k * bits <= 63, "z_value: interleaved width must fit a signed long"
    out: Column = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = c.cast("long")
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(x, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return out


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_partitions: int = 32,
    z_col: str = "__z",
) -> DataFrame:
    """Return ``df`` physically clustered by the Morton key of ``cols``
    (columns pre-normalized with pmod 2^bits): range-partitioned AND
    sorted within partitions, so a parquet write of the result carries
    tight per-file min/max on EVERY participating column. The helper
    keeps the z column; drop it after writing if undesired."""
    z = z_value([F.pmod(F.col(c), F.lit(1 << bits)) for c in cols], bits)
    return (
        df.withColumn(z_col, z)
        .repartitionByRange(n_partitions, F.col(z_col))
        .sortWithinPartitions(z_col)
    )
