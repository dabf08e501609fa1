"""Data sources/sinks — the reference's io layer (DataType enum
/root/reference/engine/src/io/DataType.h:9-18: PARQUET ORC CSV JSON +
in-memory + MYSQL/POSTGRESQL/SQLITE) re-expressed as Spark readers/writers.

Spark's built-ins already cover every format; these helpers add the
reference's ergonomics (format inference, schema hints, JDBC presets) and
the write path the reference never had (SURVEY §2.8: "Sinks: none").
"""

from blazingsql_spark.sources.io import infer_format, read_any, write_any
from blazingsql_spark.sources.layout import zorder_key, zorder_write
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
