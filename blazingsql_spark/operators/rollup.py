"""Hypertable-style time rollups: materialized time-bucketed aggregates.

The timeseries-DB pattern (continuous aggregates): raw events land in a
time-partitioned table; a rollup table holds per-bucket aggregates and is
the target for dashboard-style queries — 100-1000× less data scanned.

Spark-first shape: the rollup is a parquet dataset partitioned by calendar
date, so (a) refreshing a day overwrites one partition (dynamic partition
overwrite), (b) time-range queries prune partitions at planning time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_rollup(
    events: DataFrame,
    bucket: str = "5 minutes",
    dims: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Aggregate raw events into (bucket_start, dims...) grains with the
    standard re-aggregable stats (count/sum/min/max — avg derivable)."""
    dims = dims if dims is not None else ["event_type"]
    return (
        events.groupBy(F.window(ts_col, bucket).alias("w"), *dims)
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            F.to_date(F.col("w.start")).alias("bucket_date"),
            *dims,
            "n",
            "sum_v",
            "min_v",
            "max_v",
        )
    )


def materialize_rollup(
    events: DataFrame,
    path: str,
    bucket: str = "5 minutes",
    dims: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> None:
    """Write the rollup partitioned by bucket_date. Refreshing late data for
    one day rewrites only that partition (partitionOverwriteMode=dynamic)."""
    rollup = build_rollup(events, bucket, dims, ts_col, value_col)
    (
        rollup.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_date")
        .parquet(path)
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def reaggregate(rollup: DataFrame, dims: list[str] | None = None) -> DataFrame:
    """Roll the rollup further up (e.g. 5-minute grain → per-dim totals):
    counts/sums add, min/min and max/max compose — no raw-data rescan."""
    dims = dims if dims is not None else ["event_type"]
    return rollup.groupBy(*dims).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def refresh_rollup(
    spark: SparkSession,
    late_events: DataFrame,
    events_path: str,
    rollup_path: str,
    bucket: str = "5 minutes",
    dims: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> list:
    """Late-data maintenance: land ``late_events`` in the raw store, then
    recompute ONLY the calendar dates they touch.

    The affected-date set is collected driver-side — bounded by distinct
    DATES in the late batch (a handful), never by rows. The rebuild reads
    the raw store filtered to those dates (partition-pruned when the store
    is date-partitioned) and dynamic-partition-overwrites exactly those
    rollup partitions; every other date's files are untouched. This is the
    continuous-aggregate refresh policy of the timeseries DBs, on Spark
    primitives. Returns the refreshed dates.
    """
    dates = [
        r["d"] for r in late_events.select(F.to_date(F.col(ts_col)).alias("d")).distinct().collect()
    ]
    if not dates:
        return []
    late_events.write.mode("append").parquet(events_path)
    raw = spark.read.parquet(events_path).filter(F.to_date(F.col(ts_col)).isin(dates))
    rollup = build_rollup(raw, bucket, dims, ts_col, value_col)
    (
        rollup.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_date")
        .parquet(rollup_path)
    )
    return dates


def rollup_refresh_stream(
    spark: SparkSession,
    event_stream: DataFrame,
    events_path: str,
    rollup_path: str,
    checkpoint_path: str,
    bucket: str = "5 minutes",
    dims: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
):
    """Streaming continuous-aggregate maintenance: every micro-batch —
    including late rows — lands in the raw store and refreshes exactly the
    day partitions it touches via ``refresh_rollup``. foreachBatch keeps
    the refresh transactional per epoch; out-of-order data needs no special
    casing because the refresh is idempotent per date (full recompute of
    that date from the raw store)."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        refresh_rollup(
            spark, batch, events_path, rollup_path, bucket, dims, ts_col, value_col
        )

    return (
        event_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
