"""Skew- and shuffle-management operators.

At 100 TB the failure mode isn't wrong answers, it's one straggler task
holding a hot key's entire partition. Two standard remedies, packaged:

- ``salted_join``: explode the small side S ways, salt the big side's key
  with hash%S — the hot key spreads over S tasks. AQE's skew-join splitting
  (on by default in ``session.get_spark``) handles moderate skew
  automatically; salting is for the pathological keys AQE can't split
  (a single key bigger than an executor).

- ``bucketed_table``: write a table bucketed+sorted by its join key. Joins
  between tables bucketed the same way skip the shuffle entirely
  (SortMergeJoin with zero Exchange) — the Spark answer to the reference's
  pre-partitioned `bc.partition(df, by=...)` workflow (context.py:3018).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join where `big[on]` is heavily skewed: salt big's key into
    `salt` sub-keys and replicate small accordingly. Output == big.join(small,
    on, how) for inner/left joins.

    Cost model: small side grows ×salt (it's the broadcast/replicated side
    anyway); the hot key's rows land on `salt` different reducers.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    big_salted = big.withColumn("__salt", (F.hash(F.col(on)) % salt + salt) % salt)
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_salted, [on, "__salt"], how)
    return out.drop("__salt")


def bucketed_table(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    bucket_col: str,
    num_buckets: int = 16,
) -> DataFrame:
    """Persist `df` as a bucketed+sorted managed table and return it.

    Two tables bucketed by the same column/count co-locate: Catalyst plans
    their join with NO shuffle exchange (asserted in tests/test_scale.py).
    This is the ingest-once/join-many layout for fact tables at scale.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(name)
    )
    return spark.table(name)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str] | None = None,
    count_as: str | None = "n",
    salt: int = 16,
) -> DataFrame:
    """Two-phase grouped aggregation for pathologically hot keys: phase 1
    aggregates on (keys + hash-salt) — the hot key's rows spread over
    `salt` reducers — phase 2 merges the ≤salt partials per key. Result is
    EXACTLY groupBy(keys).agg(count, sums) (integer/long sums merge
    losslessly; use decomposed sum/count for averages).

    AQE's skew split handles moderate skew on its own; this is the remedy
    for a single key larger than an executor, at the cost of one extra
    (tiny: |keys|·salt rows) aggregation stage.
    """
    sum_cols = sum_cols or {}
    # row-dependent salt (NOT key-dependent — the point is to spread one
    # key's rows); partial merge is exact so the salt value itself never
    # affects the result
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        F.count("*").alias("__pc"),
        *[F.sum(src).alias(f"__ps_{dst}") for dst, src in sum_cols.items()],
    )
    aggs = []
    if count_as:
        aggs.append(F.sum("__pc").alias(count_as))
    aggs += [F.sum(f"__ps_{dst}").alias(dst) for dst in sum_cols]
    return phase1.groupBy(*keys).agg(*aggs)
