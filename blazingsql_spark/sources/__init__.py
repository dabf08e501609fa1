"""Data sources/sinks — the reference's io layer (DataType enum
/root/reference/engine/src/io/DataType.h:9-18: PARQUET ORC CSV JSON +
in-memory + MYSQL/POSTGRESQL/SQLITE) re-expressed as Spark readers/writers.

Spark's built-ins already cover every format; these helpers add the
reference's ergonomics (format inference, schema hints, JDBC presets) and
the write path the reference never had (SURVEY §2.8: "Sinks: none").
Beyond-reference formats, zero dependencies: Avro OCF (avro_ocf — no
spark-avro jar here), WebDataset tar/zip shards (archives, batch +
streaming), and Spark-4 Python DataSource registrations for both (pyds:
spark.read.format("avro_ocf"/"webdataset") with a two-phase commit).
"""

from blazingsql_spark.sources.arrow_ipc import read_arrow_ipc, write_arrow_ipc
from blazingsql_spark.sources.avro_ocf import read_avro, write_avro
from blazingsql_spark.sources.archives import (
    read_tar_members,
    read_webdataset,
    read_zip_members,
    stream_webdataset,
    write_tar_shards,
)
from blazingsql_spark.sources.io import infer_format, read_any, write_any
from blazingsql_spark.sources.layout import zorder_key, zorder_write
from blazingsql_spark.sources.pyds import register_data_sources
from blazingsql_spark.sources.jdbc import (
    derby,
    find_sqlite_jdbc_jar,
    jdbc_reader,
    jdbc_writer,
    mysql,
    postgresql,
    sqlite,
)

__all__ = [
    "read_arrow_ipc",
    "write_arrow_ipc",
    "read_avro",
    "write_avro",
    "read_tar_members",
    "read_zip_members",
    "read_webdataset",
    "stream_webdataset",
    "write_tar_shards",
    "register_data_sources",
    "infer_format",
    "read_any",
    "write_any",
    "zorder_key",
    "zorder_write",
    "jdbc_reader",
    "jdbc_writer",
    "find_sqlite_jdbc_jar",
    "derby",
    "mysql",
    "postgresql",
    "sqlite",
]
