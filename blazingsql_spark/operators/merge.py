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

from pyspark.sql import Column, DataFrame, Window
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


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    version_col: str = "version",
) -> DataFrame:
    """Apply a CDC change stream to a snapshot: latest-version-wins per
    key, with delete tombstones — the read-side completion of the MERGE
    family (merge_upsert has no delete path, scd2_apply keeps history;
    this materializes "current state after the log").

    ``changes`` rows carry ``op_col`` in {'I','U','D'} and a monotonically
    comparable ``version_col`` (commit LSN / event time); for each key
    only the highest-version change matters: I/U upsert the row, D
    removes the key. Ties on version break deterministically: first
    prefer the delete (a same-version D|U pair means the key's final
    fate is engine-ordering-dependent otherwise), then — for two
    same-version non-delete rows — by an xxhash64 of the payload
    columns, so the SURVIVING PAYLOAD is also engine-independent (a
    well-formed log has unique (key, version) per non-delete op, but a
    replayed/duplicated log must still apply reproducibly).

    Plan shape at 100 TB: one window over (key) ordered by (version,
    op-rank, payload-hash) on the CHANGE LOG only (sized by the log,
    not the snapshot), then one shuffle join against the snapshot —
    both on the same key, so the stages co-partition; no row-at-a-time
    apply loop.
    """
    payload = [c for c in snapshot.columns if c not in key_cols]
    op_rank = F.when(F.col(op_col) == "D", 1).otherwise(0)
    # xxhash64 SKIPS null inputs (xxhash64(NULL,'a',s) == xxhash64('a',
    # NULL,s)), so two same-version payloads differing only in WHICH column
    # is null would hash identically and the survivor would again be
    # engine-ordering-dependent — exactly the hole this hash exists to
    # close (ADVICE r7). Coalesce every column to a NULL-distinguishing
    # sentinel so null participates in the hash positionally; the columns
    # are hashed as separate arguments (not concatenated), so the only
    # residual collision is a real payload string equal to the sentinel
    # itself.
    payload_hash = F.xxhash64(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
            for c in payload
        ],
        F.lit(42),
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), op_rank.desc(), payload_hash.asc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = latest.filter(F.col(op_col) != "D").select(*key_cols, *payload)
    # every touched key leaves the snapshot (anti-join), then non-delete
    # finals come back — deletes simply never return
    survivors = snapshot.join(latest.select(*key_cols), key_cols, "left_anti")
    return survivors.unionByName(upserts)
