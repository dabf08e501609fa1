"""Arrow IPC (Feather V2) file source/sink — the zero-copy interchange
format of the Arrow ecosystem (pandas/polars/duckdb all read it
natively), built only on pyarrow + the binaryFile source, same pattern
as the zero-dependency Avro OCF pair (sources/avro_ocf.py):

- write: every partition serializes its Arrow batches into ONE
  part-*.arrow file directly from the executor (atomic per-file rename;
  shared-filesystem layout — compose with sources.manifest for atomic
  multi-file publication). The schema travels via pyspark's own
  to_arrow_schema, so Spark→Arrow type mapping is exactly what Spark's
  internal Arrow path uses, not a hand-rolled table.
- read: schema from one file's footer on the driver, data via
  binaryFile (one task per file) feeding mapInArrow — record batches
  flow Arrow→Arrow into Spark with NO pandas round trip, which is what
  keeps the promise of exact values (pandas conversion turns
  int64-with-nulls into float64, silently corrupting ids past 2^53,
  and rejects timestamps outside datetime64[ns]'s range). Every file's
  schema is checked against the directory schema and a mismatch names
  the offending file (the same cross-file contract read_avro enforces).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from blazingsql_spark.sources.avro_ocf import _check_posix_path

_MODES = ("overwrite", "append", "error", "ignore")


def write_arrow_ipc(
    df: DataFrame, path: str, compression: str | None = None, mode: str = "overwrite"
) -> int:
    """Distributed IPC write; returns the part-file count (0 when
    mode='ignore' skips a non-empty target). ``mode`` mirrors
    DataFrameWriter ('overwrite'/'append'/'error'/'ignore') and anything
    else raises — an unrecognized mode must not silently behave like
    append. An empty DataFrame writes one zero-batch file so schema
    round-trips."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    from pyspark.sql.pandas.types import to_arrow_schema

    if mode not in _MODES:
        raise ValueError(f"arrow: unknown write mode {mode!r}; one of {_MODES}")
    _check_posix_path(path)
    os.makedirs(path, exist_ok=True)
    # match the READER's file set (.arrow AND .feather — Feather V2 is the
    # same format and the reader unions both): mode='error' must see
    # foreign feather data, and 'overwrite' must remove it, or the next
    # read unions stale rows with the new write
    existing = [f for f in os.listdir(path) if f.endswith((".arrow", ".feather"))]
    if existing:
        if mode == "error":
            raise ValueError(f"arrow: target {path} already has {len(existing)} files")
        if mode == "ignore":
            return 0
        if mode == "overwrite":
            for f in existing:
                os.remove(os.path.join(path, f))
    arrow_schema = to_arrow_schema(df.schema)
    # One job id per WRITE CALL (driver-side), final part names derived
    # from the task's partitionId: a retried or speculative attempt
    # re-renames onto the same final name (idempotent — os.replace with
    # identical content), instead of leaving a duplicate uuid-named part
    # that later reads silently union in. Distinct write calls still get
    # distinct names, so mode='append' never clobbers an earlier run.
    job_id = uuid.uuid4().hex[:12]

    def write_part(batches):
        from pyspark import TaskContext

        # IpcWriteOptions is a cython object cloudpickle cannot ship —
        # construct it executor-side from the plain compression string
        opts = (
            ipc.IpcWriteOptions(compression=compression) if compression else None
        )
        wrote = False
        tc = TaskContext.get()
        fname = os.path.join(
            path, f"part-{job_id}-{tc.partitionId():05d}.arrow"
        )
        # tmp name is per-ATTEMPT: concurrent speculative attempts must not
        # interleave writes into one tmp file
        tmp = f"{fname}.{tc.taskAttemptId()}.tmp"
        sink = None
        writer = None
        for batch in batches:
            if writer is None:
                sink = pa.OSFile(tmp, "wb")
                writer = ipc.new_file(sink, arrow_schema, options=opts)
            writer.write_batch(
                batch.cast(arrow_schema) if batch.schema != arrow_schema else batch
            )
            wrote = True
        if writer is not None:
            writer.close()
            sink.close()
            os.replace(tmp, fname)  # atomic per-file rename
        if wrote:
            yield pa.RecordBatch.from_pydict({"file": [fname]})

    marker = df.mapInArrow(write_part, "file string").collect()
    if not marker:
        # empty input: persist the schema anyway for an empty round-trip —
        # through the same tmp-write + atomic-rename window as every other
        # part file (a crash mid-write must not leave a truncated
        # final-name file to poison later reads/appends)
        fname = os.path.join(path, f"part-{job_id}-empty.arrow")
        dopts = ipc.IpcWriteOptions(compression=compression) if compression else None
        tmp = fname + ".tmp"
        with pa.OSFile(tmp, "wb") as sink:
            ipc.new_file(sink, arrow_schema, options=dopts).close()
        os.replace(tmp, fname)
        return 1
    return len(marker)


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of part-*.arrow IPC files — or a single
    .arrow/.feather file (Feather V2 IS the IPC file format) — one task
    per file, record batches streamed Arrow→Arrow (no pandas round trip),
    every file's schema validated against the directory schema by name."""
    import pyarrow as pa
    import pyarrow.ipc as ipc
    from pyspark.sql.pandas.types import from_arrow_schema

    _check_posix_path(path)
    if os.path.isfile(path):
        files = [path]
        glob = os.path.basename(path)
    else:
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".arrow", ".feather"))
        )
        glob = "*.{arrow,feather}"
    if not files:
        raise ValueError(f"arrow: no part .arrow/.feather files under {path}")
    with pa.OSFile(files[0], "rb") as fh:
        arrow_schema = ipc.open_file(fh).schema
    # tz-less arrow timestamps must come back as TimestampNTZ (a tz-aware
    # column carries its zone in the arrow type, so it still maps to
    # TimestampType) — without the flag NTZ columns silently gain
    # session-timezone semantics on the round trip
    spark_schema = from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True)
    ref_schema = arrow_schema.remove_metadata()

    def decode_files(batches):
        for batch in batches:
            paths = batch.column(0).to_pylist()
            contents = batch.column(1).to_pylist()
            for fpath, blob in zip(paths, contents):
                reader = ipc.open_file(pa.BufferReader(blob))
                fsch = reader.schema.remove_metadata()
                if not fsch.equals(ref_schema):
                    # appended/foreign file with a different shape: fail
                    # LOUDLY, naming the file — to_pandas/arrow coercion
                    # would otherwise drop or miscast columns silently
                    raise ValueError(
                        f"arrow: {fpath} schema does not match the "
                        f"directory schema resolved from the first file: "
                        f"{fsch} vs {ref_schema}"
                    )
                for i in range(reader.num_record_batches):
                    rb = reader.get_batch(i)
                    if rb.num_rows:
                        yield rb

    binary = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )
    return binary.select("path", "content").mapInArrow(decode_files, spark_schema)
