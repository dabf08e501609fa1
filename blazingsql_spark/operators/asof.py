"""As-of and range joins.

- ``asof_join``: for each left row, the latest right row with
  right.ts <= left.ts (per key) — the time-series "last known value" join.
  Implemented as union + window (one shuffle on (key, ts)), NOT a
  per-group pandas merge_asof: the union trick scales to arbitrarily large
  sides because state per row is O(1) (last-value carry-forward), while
  merge_asof would materialize whole groups in Python.

- ``range_join``: equi-keys + bounded numeric/time distance, implemented by
  bucketizing the range key so the join is an equi-join on (key, bucket)
  with a small bucket fan-out — no BroadcastNestedLoopJoin blow-up at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    right_value_cols: list[str] | None = None,
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row per ``direction``,
    matching on the optional `by` keys:

    - ``backward`` (default): latest right row at-or-before left[on];
    - ``forward``: earliest right row at-or-after left[on];
    - ``nearest``: whichever of the two is closer in ``on`` (exact ties
      resolve backward) — pandas ``merge_asof`` direction semantics.

    Union-and-carry-forward: tag both sides, sort by (by, on, side) within
    one window, and carry the last right row forward onto left rows.
    One range-free shuffle; no Python; skew-bounded by the `by` keys.
    ``forward`` is the same scan in descending ``on`` order; ``nearest``
    evaluates both windows over the SAME exchange (two sorts, one shuffle)
    and picks per-row.

    The whole right row (timestamp + all value columns) is carried as ONE
    struct through a single ``last(ignorenulls=True)``, so the matched
    timestamp and values always come from the same right row — a NULL in
    one right value column can never splice in a stale value from an older
    row. Duplicate (by, on) right rows are resolved deterministically: the
    row with the greatest xxhash64 of its value columns wins (DuckDB's ASOF
    JOIN leaves this unspecified; we pin it so repeated runs agree).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction}")
    by = by or []
    rvals = right_value_cols or [c for c in right.columns if c != on and c not in by]

    lhs = left.select(
        *by, F.col(on).alias("__t"), F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    rhs = right.select(
        *by, F.col(on).alias("__t"), F.lit(0).alias("__is_left"),
        F.struct(F.col(on).alias("__ts"), *[F.col(c) for c in rvals]).alias("__rrow"),
        F.xxhash64(*[F.col(c) for c in rvals]).alias("__tie"),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # right rows sort before left rows at equal timestamps → "at or before"
    # (resp. "at or after" in the descending scan); among right rows tied
    # on __t, __tie ascending makes "last" = greatest hash, both scans.
    w_bwd = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t"), F.col("__is_left"), F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").desc(), F.col("__is_left"), F.col("__tie"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry_cols = ["*"]
    if direction in ("backward", "nearest"):
        carry_cols.append(F.last("__rrow", ignorenulls=True).over(w_bwd).alias("__cb"))
    if direction in ("forward", "nearest"):
        carry_cols.append(F.last("__rrow", ignorenulls=True).over(w_fwd).alias("__cf"))
    carried = unioned.select(*carry_cols).filter(F.col("__is_left") == 1)

    if direction == "backward":
        chosen = F.col("__cb")
        delta = F.col("__t") - F.col("__cb")["__ts"]
    elif direction == "forward":
        chosen = F.col("__cf")
        delta = F.col("__cf")["__ts"] - F.col("__t")
    else:
        d_b = F.col("__t") - F.col("__cb")["__ts"]
        d_f = F.col("__cf")["__ts"] - F.col("__t")
        take_f = F.col("__cb").isNull() | (F.col("__cf").isNotNull() & (d_f < d_b))
        chosen = F.when(take_f, F.col("__cf")).otherwise(F.col("__cb"))
        delta = F.when(take_f, d_f).otherwise(d_b)
    carried = carried.withColumn("__c", chosen).withColumn("__d", delta)

    out_cols = [F.col("__lrow")[c].alias(c) for c in left.columns]
    if tolerance is not None:
        keep = F.col("__c").isNotNull() & (F.col("__d") <= tolerance)
        out_cols += [
            F.when(keep, F.col("__c")[c]).alias(c if c not in left.columns else f"right_{c}")
            for c in rvals
        ]
    else:
        out_cols += [
            F.col("__c")[c].alias(c if c not in left.columns else f"right_{c}")
            for c in rvals
        ]
    return carried.select(*out_cols)


_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "long"}


def _bucket_fdiv(width: float, *integral_col_dtypes: str | None):
    """Exact floor-division bucketizer shared by ``range_join`` and
    ``interval_join``.

    When ``width`` is a whole number AND every participating column dtype
    is integral, buckets are computed in pure LONG arithmetic
    (``(x - pmod(x, w)) div w`` — exact floor division for any int64,
    e.g. epoch nanoseconds). The double-division fallback (fractional
    widths or float keys) rounds above 2^53, where a key could register in
    the wrong bucket and a matching pair be silently dropped — hence the
    integral fast path, not just a doc note.
    """
    integral = (
        width.is_integer()
        and width > 0
        and all(t in _INT_TYPES for t in integral_col_dtypes)
    )
    if integral:
        wi = int(width)

        def fdiv(col_name):
            c = f"`{col_name}`"
            # subtract the non-negative remainder, then `div`: numerator
            # exactly divisible, so truncation == floor even for negatives
            return F.expr(
                f"(CAST({c} AS BIGINT) - pmod(CAST({c} AS BIGINT), {wi})) div {wi}"
            )

    else:

        def fdiv(col_name):
            return F.floor(F.col(col_name) / width).cast("long")

    return fdiv


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_distance: float,
    by: list[str] | None = None,
) -> DataFrame:
    """Join rows whose range keys differ by at most ``max_distance``
    (|left_on - right_on| <= max_distance), plus optional equi `by` keys.

    Bucketize both sides at width=max_distance; a pair within distance d
    must land in the same or adjacent bucket, so the right side is exploded
    into (bucket-1, bucket, bucket+1) and the join is a plain equi-join with
    3x fan-out, filtered exactly afterward. Scale: shuffle keys are
    (by, bucket) — never a nested-loop join.

    Integral keys with a whole-number distance bucket in pure long
    arithmetic (see ``_bucket_fdiv``) so epoch-nanosecond keys beyond 2^53
    never land in the wrong bucket.
    """
    by = by or []
    width = float(max_distance)
    fdiv = _bucket_fdiv(
        width, dict(left.dtypes).get(left_on), dict(right.dtypes).get(right_on)
    )
    lb = left.withColumn("__bucket", fdiv(left_on))
    rb = right.withColumn("__bucket0", fdiv(right_on)).withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.col("__bucket0") - 1, F.col("__bucket0"), F.col("__bucket0") + 1
            )
        ),
    )
    joined = lb.join(rb, by + ["__bucket"])
    return joined.filter(
        F.abs(F.col(left_on) - F.col(right_on)) <= max_distance
    ).drop("__bucket", "__bucket0")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: float,
    by: list[str] | None = None,
) -> DataFrame:
    """Join rows whose [start, end] intervals OVERLAP (half-open
    ``l_start < r_end AND r_start < l_end``), plus optional equi ``by``
    keys — the time-range/genomic-interval primitive the reference (and
    stock Spark) can only express as a nested-loop theta join.

    Bucketize the number line at ``bucket_width``: each interval registers
    in every bucket it touches (``sequence(floor(start/w), floor(end/w))``),
    the join is a plain equi-join on (by, bucket), the exact overlap
    predicate filters afterward, and duplicate pairs (two intervals
    sharing several buckets) are collapsed by keeping only the FIRST
    shared bucket (``greatest(floor(l_start/w), floor(r_start/w)) ==
    bucket`` — a stateless dedup, no distinct shuffle).

    Scale: shuffle keys are (by, bucket); fan-out per row is
    interval_length/width + 1, so pick ``bucket_width`` near the typical
    interval length. Skewed hot buckets behave like any hot join key
    (AQE skew split / salting apply).

    Numeric safety: integral endpoints with a whole-number width bucket in
    pure LONG arithmetic (see ``_bucket_fdiv``) so epoch-nanosecond
    endpoints beyond 2^53 never register in the wrong bucket.
    """
    by = by or []
    w = float(bucket_width)
    ld, rd = dict(left.dtypes), dict(right.dtypes)
    fdiv = _bucket_fdiv(
        w,
        ld.get(left_start),
        ld.get(left_end),
        rd.get(right_start),
        rd.get(right_end),
    )

    def buckets(start, end):
        return F.sequence(fdiv(start), fdiv(end))

    lb = left.withColumn("__bucket", F.explode(buckets(left_start, left_end)))
    rb = right.withColumn("__bucket", F.explode(buckets(right_start, right_end)))
    joined = lb.join(rb, by + ["__bucket"])
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    first_shared = (
        F.greatest(fdiv(left_start), fdiv(right_start)) == F.col("__bucket")
    )
    return joined.filter(overlap & first_shared).drop("__bucket")
