"""JDBC sources — the reference reads MySQL/PostgreSQL/SQLite tables
(engine/src/io/data_provider/sql/MySQLDataProvider.cpp etc., DataType.h:16-18).

Spark equivalent: ``spark.read.format("jdbc")``. The MySQL/PostgreSQL/SQLite
driver jars are not bundled in this environment, so those builders construct
the reader configuration (unit-testable) and fail with a clear message only
at `.load()` time if the driver jar is absent. Embedded Apache Derby's driver
DOES ship with Spark itself, so the ``derby`` builder runs the whole JDBC
source path end-to-end in-container (write, partitioned read, predicate
pushdown — ``tests/test_sources.py::test_jdbc_derby_roundtrip_e2e``).

Partitioned reads (partition_column/num_partitions) split the table scan
across executors — the 100 TB ingest path the reference handled via its
partition_batch sizing.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: Any,
) -> DataFrameReader:
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1_000_000)
            .option("numPartitions", num_partitions or 8)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def mysql(
    spark: SparkSession, host: str, port: int = 3306, database: str = "", table: str = "", **kw: Any
) -> DataFrameReader:
    """Reference: bc.create_table(..., from mysql) via MySQLDataProvider."""
    return jdbc_reader(
        spark,
        f"jdbc:mysql://{host}:{port}/{database}",
        table,
        driver="com.mysql.cj.jdbc.Driver",
        **kw,
    )


def postgresql(
    spark: SparkSession, host: str, port: int = 5432, database: str = "", table: str = "", **kw: Any
) -> DataFrameReader:
    return jdbc_reader(
        spark,
        f"jdbc:postgresql://{host}:{port}/{database}",
        table,
        driver="org.postgresql.Driver",
        **kw,
    )


def sqlite(spark: SparkSession, path: str, table: str, **kw: Any) -> DataFrameReader:
    return jdbc_reader(spark, f"jdbc:sqlite:{path}", table, driver="org.sqlite.JDBC", **kw)


def derby(spark: SparkSession, path: str, table: str, **kw: Any) -> DataFrameReader:
    """Embedded Apache Derby — the one JDBC database whose driver SHIPS in
    Spark's own jars directory, so it is the in-container end-to-end proof
    of the JDBC source family: the same Spark JDBC relation code
    (option plumbing, partitioned reads, predicate pushdown) that serves
    MySQL/PostgreSQL/SQLite (reference:
    engine/src/io/data_parser/sql/SQLiteParser.cpp and siblings) runs for
    real here, only the dialect/driver differ."""
    return jdbc_reader(
        spark,
        f"jdbc:derby:{path}",
        table,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        **kw,
    )


def jdbc_writer(
    df,
    url: str,
    table: str,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    mode: str = "error",
    batch_size: int | None = None,
    **options: Any,
):
    """JDBC write builder (corpus → warehouse export path). ``batch_size``
    maps to the JDBC ``batchsize`` option — rows per INSERT round trip, the
    write-side analogue of partitioned reads."""
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    if batch_size:
        writer = writer.option("batchsize", batch_size)
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer


def find_sqlite_jdbc_jar() -> str | None:
    """Locate a sqlite-jdbc driver jar: $SQLITE_JDBC_JAR, the PySpark jars
    dir, or /opt/jars. Returns None when absent — this container ships no
    JDBC drivers and has no network to fetch one (verified: Maven Central
    unresolvable), so end-to-end JDBC tests gate on this probe and activate
    in any environment that provides the jar."""
    import glob
    import os

    import pyspark

    env = os.environ.get("SQLITE_JDBC_JAR")
    if env and os.path.exists(env):
        return env
    for pattern in (
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "sqlite-jdbc*.jar"),
        "/opt/jars/sqlite-jdbc*.jar",
    ):
        hits = glob.glob(pattern)
        if hits:
            return sorted(hits)[-1]
    return None
