"""MERGE / upsert / SCD2 emulation — the CDC write patterns.

The reference has no DML at all (SURVEY §2.8: no INSERT/CTAS/write path);
lakehouse MERGE INTO needs Delta/Iceberg jars this container lacks. These
operators emulate the semantics with pure DataFrame algebra so the same
logic runs anywhere:

- ``merge_upsert``: target ⟕ source by key → source wins on conflict
  (classic upsert). One anti-join + union — the shuffle is on the merge key
  both times, so at scale the two stages co-partition.
- ``scd2_apply``: slowly-changing-dimension type 2 — close current rows
  that changed (set valid_to), append the new versions (valid_from=ts,
  valid_to=null), keep history immutable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key_cols: list[str]) -> DataFrame:
    """UPSERT: rows of `source` replace same-key rows of `target`; unmatched
    target rows survive. Equivalent to MERGE WHEN MATCHED UPDATE ALL WHEN
    NOT MATCHED INSERT ALL."""
    kept = target.join(source.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(source)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    effective_ts: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply updates to an SCD2 dimension.

    `dim` carries (business key cols, attributes, valid_from, valid_to with
    NULL = current). For every update key: the current row is closed at
    `effective_ts`, and a new current row is appended. Non-updated history
    is untouched. Two key-partitioned joins, no window over history.
    """
    upd_keys = updates.select(*key_cols).distinct()

    current = dim.filter(F.col(valid_to).isNull())
    history = dim.filter(F.col(valid_to).isNotNull())

    closed = (
        current.join(upd_keys, key_cols, "left_semi")
        .withColumn(valid_to, effective_ts)
    )
    untouched_current = current.join(upd_keys, key_cols, "left_anti")

    new_rows = updates.withColumn(valid_from, effective_ts).withColumn(
        valid_to, F.lit(None).cast(dim.schema[valid_to].dataType)
    )

    return history.unionByName(closed).unionByName(untouched_current).unionByName(new_rows)
