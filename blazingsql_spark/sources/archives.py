"""Tar/zip shard ingestion — the WebDataset layout, zero dependencies.

Large multimodal training corpora ship as directories of tar shards whose
members are grouped by a key prefix (``000123.jpg`` + ``000123.txt`` +
``000123.json`` = one sample). The reference engine has no archive path
at all; this is training-data superset surface like functions.multimodal,
and the stdlib (tarfile/zipfile over in-memory bytes) makes it real:

- ``read_tar_members`` / ``read_zip_members``: one row per archive
  member — (shard, member, payload) — via Spark's binaryFile source (one
  task per shard) + an Arrow-batched ``mapInPandas`` that walks the
  archive in memory. Per-task memory is one shard.
- ``read_webdataset``: members regrouped into one row per SAMPLE —
  (shard, key, exts, payloads) with parallel arrays for the member
  extensions and their bytes (a map<string,binary> would be the natural
  type, but parallel arrays keep every cell hashable for the oracle
  harness and zip_with-able JVM-side). Grouping happens inside the same
  Python pass — members of a sample are adjacent in a well-formed
  WebDataset shard, but this implementation groups by key across the
  whole shard so member order never matters.
- ``write_tar_shards``: the testing/export sink — partitions of
  (key, ext, payload) rows written as one tar shard per partition from
  the executor, same shared-POSIX-path contract as sources.avro_ocf.

At 100 TB: shards are the parallelism unit (the layout's whole point) —
binaryFile gives one task per shard, nothing shuffles until the caller
joins/filters the sample rows, and a sample's payload bytes stay in one
row end to end.
"""

from __future__ import annotations

import io
import os
import tarfile
import uuid
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("member", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("exts", T.ArrayType(T.StringType(), containsNull=False)),
        T.StructField("payloads", T.ArrayType(T.BinaryType(), containsNull=False)),
    ]
)


def _binary_files(spark: SparkSession, path: str, glob: str) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if os.path.isdir(path) or "://" in path:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _iter_tar(payload: bytes):
    with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
        for m in tf:
            if m.isfile():
                yield m.name, tf.extractfile(m).read()


def _iter_zip(payload: bytes):
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            if not info.is_dir():
                yield info.filename, zf.read(info)


def _members_reader(walk):
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                for name, data in walk(bytes(content)):
                    rows.append((shard, name, data))
            yield pd.DataFrame(rows, columns=["shard", "member", "payload"])

    return batches


def read_tar_members(spark: SparkSession, path: str, glob: str = "*.tar") -> DataFrame:
    """One row per tar member: (shard, member, payload)."""
    files = _binary_files(spark, path, glob)
    return files.select("path", "content").mapInPandas(
        _members_reader(_iter_tar), _MEMBER_SCHEMA
    )


def read_zip_members(spark: SparkSession, path: str, glob: str = "*.zip") -> DataFrame:
    """One row per zip member: (shard, member, payload)."""
    files = _binary_files(spark, path, glob)
    return files.select("path", "content").mapInPandas(
        _members_reader(_iter_zip), _MEMBER_SCHEMA
    )


def split_member_key(member: str) -> tuple[str, str]:
    """WebDataset key rule: the sample key is the member path up to the
    FIRST dot of the basename, the extension everything after it —
    ``a/b/000123.seg.png`` -> (``a/b/000123``, ``seg.png``)."""
    d, base = os.path.split(member)
    if "." in base:
        stem, ext = base.split(".", 1)
    else:
        stem, ext = base, ""
    return (os.path.join(d, stem) if d else stem), ext


def group_samples(payload: bytes) -> list[tuple[str, list[str], list[bytes]]]:
    """Group one tar shard's members into samples: [(key, sorted exts,
    aligned payloads)]. The ONE implementation behind the batch reader,
    the streaming reader, and the DataSource-API reader — a grouping-rule
    change must not let the three silently diverge."""
    groups: dict[str, dict[str, bytes]] = {}
    for name, data in _iter_tar(payload):
        key, ext = split_member_key(name)
        groups.setdefault(key, {})[ext] = data
    out = []
    for key in sorted(groups):
        exts = sorted(groups[key])
        out.append((key, exts, [groups[key][e] for e in exts]))
    return out


def read_webdataset(spark: SparkSession, path: str, glob: str = "*.tar") -> DataFrame:
    """One row per SAMPLE: (shard, key, exts, payloads) with exts sorted
    and payloads aligned — ``F.element_at(payloads, array_position(exts,
    'txt'))`` pulls one modality JVM-side."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                for key, exts, payloads in group_samples(bytes(content)):
                    rows.append((shard, key, exts, payloads))
            yield pd.DataFrame(rows, columns=["shard", "key", "exts", "payloads"])

    files = _binary_files(spark, path, glob)
    return files.select("path", "content").mapInPandas(batches, _SAMPLE_SCHEMA)


def write_tar_shards(
    df: DataFrame,
    path: str,
    key_col: str = "key",
    ext_col: str = "ext",
    payload_col: str = "payload",
    prefix: str = "shard",
    num_shards: int | None = None,
) -> int:
    """Export (key, ext, payload) rows as WebDataset tar shards — one
    shard per partition AFTER a hash repartition on the sample key: all
    of a sample's members MUST land in one shard (splitting a sample
    across shards silently duplicates it on the sample-grouped read
    side). Written from the executor (shared-POSIX path, same contract
    as sources.avro_ocf.write_avro); ``num_shards`` controls shard
    count/size (defaults to the session shuffle parallelism). Members
    are written sorted by (key, ext) so a sample's files are adjacent,
    as WebDataset readers expect. Returns the shard count."""
    from blazingsql_spark.sources.avro_ocf import _check_posix_path

    _check_posix_path(path)
    os.makedirs(path, exist_ok=True)
    if num_shards:
        df = df.repartition(num_shards, key_col)
    else:
        df = df.repartition(key_col)
    marker = T.StructType([T.StructField("file", T.StringType())])

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            rows.extend(
                zip(pdf[key_col], pdf[ext_col], pdf[payload_col])
            )
        if not rows:
            return
        rows.sort(key=lambda r: (r[0], r[1]))
        fname = os.path.join(path, f"{prefix}-{uuid.uuid4().hex}.tar")
        tmp = fname + ".tmp"
        with tarfile.open(tmp, "w") as tf:
            for key, ext, payload in rows:
                data = bytes(payload)
                info = tarfile.TarInfo(name=f"{key}.{ext}" if ext else key)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        os.replace(tmp, fname)
        yield pd.DataFrame({"file": [fname]})

    written = df.select(key_col, ext_col, payload_col).mapInPandas(
        write_part, marker
    ).collect()
    return len(written)


_BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def stream_webdataset(spark: SparkSession, path: str, glob: str = "*.tar") -> DataFrame:
    """STREAMING sample-grouped WebDataset reader: new tar shards landing
    in ``path`` flow through as (shard, key, exts, payloads) rows. Built
    on the file stream source over binaryFile (schema must be passed
    explicitly — Spark refuses to infer for streaming sources), so Spark's
    source log gives exactly-once SHARD processing across restarts for
    free: a shard is the atomic unit, matching how WebDataset corpora are
    produced (writers rename complete shards in, never append). Feed the
    result to foreachBatch / any sink; compose with streaming.ingest
    maintainers for index upkeep."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                for key, exts, payloads in group_samples(bytes(content)):
                    rows.append((shard, key, exts, payloads))
            yield pd.DataFrame(rows, columns=["shard", "key", "exts", "payloads"])

    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return files.select("path", "content").mapInPandas(batches, _SAMPLE_SCHEMA)
