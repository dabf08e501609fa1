"""Right-to-be-forgotten delete propagation across the corpus + its
derived index tables.

A training-data lake is append-mostly (the ingest maintainers in
streaming/ingest.py write epoch partitions and never rewrite history), so
an erasure request is the one operation that must REACH BACK into
committed data — and do it without rewriting the lake. The shape here:

1. find the epoch partitions that actually CONTAIN the target ids (one
   column-pruned scan of the id column; at 100 TB this reads one column
   of each table, nothing else);
2. rewrite ONLY those partitions via dynamic partition overwrite, minus
   the targets. Untouched epochs keep their files byte-for-byte.

Deletion is idempotent (re-running removes nothing new and rewrites the
same already-clean partitions deterministically) and crash-safe in the
same sense as the ingest writes: each partition overwrite is atomic at
the directory level, a crash part-way leaves some partitions cleaned and
the rest cleanable by re-running.

The reference engine has no DML at all (SURVEY §2.8), so this whole
surface is beyond-reference — it exists because a 100 TB TRAINING lake
legally needs it, not for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def forget_from_epoch_table(
    spark: SparkSession,
    table_dir: str,
    ids: DataFrame,
    id_col: str,
    manifest: dict | None = None,
) -> int:
    """Remove all rows matching ``ids`` (a 1-column frame of ``id_col``
    values) from one epoch-partitioned table. Returns rows removed.
    Tables without the epoch layout (legacy flat) are rewritten whole —
    correct, just without the partition-pruned write.

    ``manifest`` (sources.manifest dict) gates the scan to LIVE
    partitions on compacted index tables: without it, superseded
    gc-pending epochs would also be scanned and rewritten, and their rows
    would inflate the returned count with deletions no reader could ever
    see (their content already lives in a base partition, which IS live
    and cleaned here). Dead partitions are left for gc_partitions — the
    path that already owns their lifecycle."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(table_dir)
    except AnalysisException as e:
        # ONLY a missing table is a legitimate no-op; any other read
        # failure (corrupt footers, permissions, transient I/O) must
        # surface — returning 0 would report an erasure request satisfied
        # when nothing was even examined.
        if (
            "PATH_NOT_FOUND" in str(e)
            or "Path does not exist" in str(e)
            # a table whose every partition was already erased is empty —
            # schema inference fails, and the erasure is a legitimate no-op
            or "UNABLE_TO_INFER_SCHEMA" in str(e)
        ):
            return 0
        raise
    targets = F.broadcast(ids.select(id_col).distinct())
    if "epoch_id" not in df.columns:
        kept = df.join(targets, id_col, "left_anti")
        removed = df.count() - kept.count()
        if removed:
            kept.localCheckpoint(eager=True).write.mode("overwrite").parquet(
                table_dir
            )
        return removed
    if manifest is not None:
        from blazingsql_spark.sources.manifest import live_partition_filter

        df = df.filter(live_partition_filter(manifest))
    hits = (
        df.join(targets, id_col, "left_semi")
        .select("epoch_id")
        .distinct()
        .collect()
    )
    if not hits:
        return 0
    hit_ids = [r["epoch_id"] for r in hits]
    touched = df.filter(F.col("epoch_id").isin(hit_ids))
    # materialize the survivors BEFORE overwriting: the write lands on the
    # same directory the plan reads, so the lineage must be severed first
    # (localCheckpoint pins the survivor rows; size is bounded by the
    # touched partitions, which is the whole point of the epoch pruning)
    kept = touched.join(targets, id_col, "left_anti").localCheckpoint(eager=True)
    removed = touched.count() - kept.count()
    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(table_dir)
    )
    # Dynamic overwrite only replaces partitions PRESENT in the written
    # data: a hit epoch whose rows were ALL targets has zero survivors,
    # never appears in `kept`, and its files would silently outlive the
    # "successful" erasure. Delete those partition directories explicitly
    # (the same jvm-FS surface gc_partitions uses).
    surviving = {r["epoch_id"] for r in kept.select("epoch_id").distinct().collect()}
    emptied = [e for e in hit_ids if e not in surviving]
    if emptied:
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        conf = jsc.hadoopConfiguration()
        for e in emptied:
            p = jvm.org.apache.hadoop.fs.Path(f"{table_dir}/epoch_id={e}")
            fs = p.getFileSystem(conf)
            if fs.exists(p):
                fs.delete(p, True)
    return removed


def forget_documents(
    spark: SparkSession,
    ids: DataFrame,
    tables: dict[str, str],
    manifests: dict[str, dict] | None = None,
) -> dict[str, int]:
    """Propagate an erasure request across every table that carries the
    documents: ``tables`` maps table_dir -> id column name (the corpus,
    the MinHash band index, lexical postings, cluster labels — whatever
    derived state exists). Returns per-table removed-row counts.
    ``manifests`` optionally maps table_dir -> its sources.manifest dict
    for compacted tables (live-partition gating, see
    forget_from_epoch_table).

    Order note: indexes are cleaned AFTER their corpus in the iteration
    order given, but every step is idempotent, so a partial failure is
    repaired by re-running the same call."""
    return {
        table_dir: forget_from_epoch_table(
            spark, table_dir, ids, id_col,
            manifest=(manifests or {}).get(table_dir),
        )
        for table_dir, id_col in tables.items()
    }
