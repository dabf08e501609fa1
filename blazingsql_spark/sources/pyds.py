"""First-class Spark data sources for the zero-dependency formats.

Spark 4's Python DataSource API lets the avro_ocf and webdataset codecs
register as REAL sources — ``spark.read.format("avro_ocf").load(path)``,
``df.write.format("avro_ocf")`` — instead of module-function entry
points only. Two things improve over the plain functions:

- **planning**: ``partitions()`` hands Spark one InputPartition per
  file/shard, so scheduling, speculative retry, and task metrics come
  from Spark's own source framework rather than a binaryFile detour;
- **commit protocol**: the avro writer stages ``part-*.avro.staged``
  files from executors and the DRIVER renames them into place in
  ``commit()`` (deletes them in ``abort()``), closing the
  "minus the commit protocol" caveat of ``avro_ocf.write_avro`` —
  a failed job now leaves no readable partial output.

Register once per session::

    from blazingsql_spark.sources.pyds import register_data_sources
    register_data_sources(spark)

The shared-POSIX-path contract of sources.avro_ocf applies (plain
Python file IO — refuse object-store URIs by name).
"""

from __future__ import annotations

import glob as _glob
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


@dataclass
class _FilePartition(InputPartition):
    path: str


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str
    final: str


def _expand(path: str, suffix: str) -> list[str]:
    from blazingsql_spark.sources.avro_ocf import _check_posix_path

    _check_posix_path(path)
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, f"*{suffix}")))
    return [path]


class AvroOcfDataSource(DataSource):
    """``spark.read.format("avro_ocf")`` / ``df.write.format("avro_ocf")``
    over the zero-dependency OCF codec (sources.avro_ocf)."""

    @classmethod
    def name(cls) -> str:
        return "avro_ocf"

    def schema(self):
        from blazingsql_spark.sources.avro_ocf import avro_to_spark, read_header_schema

        files = _expand(self.options["path"], ".avro")
        if not files:
            raise ValueError(f"avro_ocf: no .avro files at {self.options['path']!r}")
        # header-only parse: planning must cost O(header), not O(first file)
        return avro_to_spark(read_header_schema(files[0]))

    def reader(self, schema: StructType) -> DataSourceReader:
        return _AvroReader(self.options["path"], schema)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _AvroWriter(self.options["path"], schema, overwrite)


class _AvroReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType):
        self.files = _expand(path, ".avro")
        self.schema = schema

    def partitions(self):
        return [_FilePartition(p) for p in self.files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        from blazingsql_spark.sources.avro_ocf import _pdf_from_rows, decode_ocf

        with open(partition.path, "rb") as fh:
            _schema, rows = decode_ocf(fh.read())
        pdf = _pdf_from_rows(rows, self.schema)
        for rec in pdf.itertuples(index=False, name=None):
            yield rec


class _AvroWriter(DataSourceWriter):
    """Two-phase write: executors stage, the driver publishes."""

    def __init__(self, path: str, schema: StructType, overwrite: bool):
        from blazingsql_spark.sources.avro_ocf import _check_posix_path

        _check_posix_path(path)
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        os.makedirs(path, exist_ok=True)

    def write(self, iterator: Iterator[Row]) -> _StagedFile:
        from blazingsql_spark.sources.avro_ocf import encode_ocf, schema_to_avro

        avro_schema = schema_to_avro(self.schema)
        names = [f.name for f in self.schema.fields]
        rows = [dict(zip(names, r)) for r in iterator]
        base = os.path.join(self.path, f"part-{uuid.uuid4().hex}.avro")
        staged = base + ".staged"
        with open(staged, "wb") as fh:
            # Rows distinguish None from nan, so real NaN payloads survive
            # (the pandas path cannot — see _encode_value)
            fh.write(encode_ocf(rows, avro_schema, nan_as_null=False))
        return _StagedFile(staged=staged, final=base)

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".avro"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            if m is not None:
                os.replace(m.staged, m.final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class WebDatasetDataSource(DataSource):
    """``spark.read.format("webdataset").load(dir)`` — one InputPartition
    per tar shard, sample-grouped rows (shard, key, exts, payloads)."""

    @classmethod
    def name(cls) -> str:
        return "webdataset"

    def schema(self):
        return "shard string, key string, exts array<string>, payloads array<binary>"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _WdsReader(self.options["path"])


class _WdsReader(DataSourceReader):
    def __init__(self, path: str):
        self.files = _expand(path, ".tar")

    def partitions(self):
        return [_FilePartition(p) for p in self.files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        from blazingsql_spark.sources.archives import group_samples

        with open(partition.path, "rb") as fh:
            payload = fh.read()
        shard = os.path.basename(partition.path)
        for key, exts, payloads in group_samples(payload):
            yield (shard, key, exts, payloads)


def register_data_sources(spark) -> None:
    """Register both sources on the session (idempotent)."""
    spark.dataSource.register(AvroOcfDataSource)
    spark.dataSource.register(WebDatasetDataSource)
