"""Format round-trips (reference io parity: PARQUET/ORC/CSV/JSON) and the
write path (a superset — the reference has no sinks)."""

from __future__ import annotations

import pytest

from blazingsql_spark.queries.registry import load_table
from blazingsql_spark.sources import infer_format, jdbc_reader, read_any, sqlite, write_any


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, tmp_path, fmt):
    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    out = f"{tmp_path}/nation_{fmt}"
    write_any(src, out, file_format=fmt)
    back = read_any(spark, out, file_format=fmt)
    assert back.count() == src.count()
    got = {r["n_name"]: r["n_regionkey"] for r in back.collect()}
    want = {r["n_name"]: r["n_regionkey"] for r in src.collect()}
    assert got == want


def test_partitioned_write_discovery(spark, tmp_path):
    src = load_table(spark, "/root/testdata/sf0.001", "customer")
    out = f"{tmp_path}/cust_part"
    write_any(src, out, partition_by=["c_mktsegment"])
    back = read_any(spark, out)
    assert back.count() == src.count()
    # partition pruning: only one directory scanned for a segment filter
    one = back.filter("c_mktsegment = 'BUILDING'")
    from blazingsql_spark.plans import physical_plan

    assert "PartitionFilters" in physical_plan(one)


def test_infer_format():
    assert infer_format("/x/y.parquet") == "parquet"
    assert infer_format("/x/y.csv") == "csv"
    assert infer_format("/x/y.ndjson") == "json"
    assert infer_format("/x/dir") == "parquet"


def test_jdbc_reader_config(spark):
    # Driver jars aren't bundled — assert builder shape, not connectivity.
    r = jdbc_reader(spark, "jdbc:postgresql://h:5432/db", "t", partition_column="id")
    assert r is not None
    r2 = sqlite(spark, "/tmp/x.db", "t")
    assert r2 is not None


def test_jdbc_writer_config(spark):
    from blazingsql_spark.sources import jdbc_writer

    df = load_table(spark, "/root/testdata/sf0.001", "nation")
    w = jdbc_writer(
        df, "jdbc:sqlite:/tmp/x.db", "nation", driver="org.sqlite.JDBC", batch_size=500
    )
    assert w is not None


@pytest.mark.skipif(
    __import__("blazingsql_spark.sources", fromlist=["find_sqlite_jdbc_jar"])
    .find_sqlite_jdbc_jar()
    is None,
    reason="no sqlite-jdbc jar in this container (no network to fetch one); "
    "set SQLITE_JDBC_JAR or drop a jar in /opt/jars to activate",
)
def test_jdbc_sqlite_roundtrip(tmp_path):
    """Full JDBC round-trip (write → partitioned read) against SQLite,
    mirroring the reference's sqliteSchema e2e suite. Gated on a driver jar:
    activates automatically in environments that provide one."""
    from pyspark.sql import SparkSession

    from blazingsql_spark.sources import find_sqlite_jdbc_jar, jdbc_writer, sqlite

    jar = find_sqlite_jdbc_jar()
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("jdbc_e2e")
        .config("spark.jars", jar)
        .getOrCreate()
    )
    try:
        db = f"{tmp_path}/e2e.db"
        src = spark.range(0, 100).withColumnRenamed("id", "k")
        jdbc_writer(
            src, f"jdbc:sqlite:{db}", "t", driver="org.sqlite.JDBC", mode="overwrite"
        ).save()
        back = sqlite(
            spark, db, "t", partition_column="k", lower_bound=0, upper_bound=100,
            num_partitions=4,
        ).load()
        assert back.count() == 100
        assert {r.k for r in back.collect()} == set(range(100))
    finally:
        spark.stop()


def test_jdbc_derby_roundtrip_e2e(spark, tmp_path):
    """REAL end-to-end JDBC: write → partitioned read → predicate pushdown
    against embedded Apache Derby, whose driver ships inside Spark's own
    jars — no network, no external jar, runs in every environment. This
    exercises the identical Spark JDBC relation code (option plumbing,
    partition splitting, filter pushdown to the remote dialect) that the
    MySQL/PostgreSQL/SQLite builders configure (reference e2e analogue:
    tests/BlazingSQLTest sqliteSchema / mysqlSchema suites)."""
    from blazingsql_spark.sources import derby, jdbc_writer

    db = f"{tmp_path}/derbydb"
    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    jdbc_writer(
        src,
        f"jdbc:derby:{db};create=true",
        "nation",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        mode="overwrite",
        batch_size=500,
    ).save()

    # plain read-back: full fidelity
    back = derby(spark, db, "nation").load()
    assert sorted((r.n_nationkey, r.n_name) for r in back.collect()) == sorted(
        (r.n_nationkey, r.n_name) for r in src.collect()
    )

    # partitioned read: 4 concurrent range splits over the key
    part = derby(
        spark, db, "nation",
        partition_column="n_nationkey", lower_bound=0, upper_bound=25,
        num_partitions=4,
    ).load()
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == src.count()

    # predicate pushdown: the filter must reach the JDBC source (shown as
    # PushedFilters in the scan), not run Spark-side over a full dump
    filtered = derby(spark, db, "nation").load().filter("n_regionkey = 0")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_regionkey" in plan.split("PushedFilters")[1][:120]
    assert filtered.count() == src.filter("n_regionkey = 0").count()


def test_binary_file_ingestion_to_multimodal(spark, tmp_path):
    """binaryFile source → multimodal decode: the real media on-ramp."""
    from blazingsql_spark.functions.multimodal import decode_features
    from blazingsql_spark.sources.io import read_binary_files

    media = tmp_path / "media"
    media.mkdir()
    payloads = {f"clip_{i}.bin": bytes([i] * (10 + i)) for i in range(4)}
    for name, blob in payloads.items():
        (media / name).write_bytes(blob)
    (media / "notes.txt").write_text("not media")

    df = read_binary_files(spark, str(media), glob="*.bin")
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 4
    got = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in rows}
    assert got == payloads

    from pyspark.sql import functions as F

    feats = decode_features(
        df.select(F.col("path").alias("doc_id"), F.col("content").alias("payload")),
        id_col="doc_id",
        feature_dim=8,
    ).collect()
    assert len(feats) == 4
    for r in feats:
        assert len(r["features"]) == 8
        assert r["n_bytes"] >= 10


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Z-order layout: after clustering on (x, y), each output file covers
    a small sub-rectangle of the value space — average per-file min-max
    span must shrink on BOTH columns vs an unclustered write (single-col
    sorting can only ever shrink one)."""
    from pyspark.sql import functions as F

    from blazingsql_spark.sources.layout import zorder_write

    n = 4096
    rows = [(i, float((i * 37) % 64), float((i * 101) % 64)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(8)

    naive = str(tmp_path / "naive")
    df.write.mode("overwrite").parquet(naive)
    zpath = str(tmp_path / "zorder")
    zorder_write(df, ["x", "y"], zpath, n_files=8, bits=6)

    import glob

    def avg_span(path, col):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            mn, mx = (
                spark.read.parquet(f)
                .agg(F.min(col), F.max(col))
                .first()
            )
            spans.append(mx - mn)
        return sum(spans) / len(spans)

    # same rows round-trip
    assert spark.read.parquet(zpath).count() == n
    for col in ("x", "y"):
        naive_span = avg_span(naive, col)
        z_span = avg_span(zpath, col)
        assert z_span < naive_span * 0.6, (col, z_span, naive_span)


def test_create_table_from_jdbc_reader(spark, tmp_path):
    """bc.create_table(name, <configured jdbc reader>) — the reference's
    create_table(name, sql_table) path — registers a queryable view
    backed by the JDBC source (real Derby database underneath)."""
    from blazingsql_spark import Context
    from blazingsql_spark.sources import derby, jdbc_writer

    db = f"{tmp_path}/derbyctx"
    src = load_table(spark, "/root/testdata/sf0.001", "region")
    jdbc_writer(
        src, f"jdbc:derby:{db};create=true", "region",
        driver="org.apache.derby.jdbc.EmbeddedDriver", mode="overwrite",
    ).save()

    bc = Context(spark=spark)
    bc.create_table("region_jdbc", derby(spark, db, "region"))
    got = bc.sql("SELECT COUNT(*) AS n FROM region_jdbc").first()["n"]
    assert got == src.count()
    assert "region_jdbc" in bc.list_tables()
    bc.drop_table("region_jdbc")


def test_arrow_ipc_roundtrip_modes_and_empty(spark, tmp_path):
    """Arrow IPC source/sink: multi-part zstd round trip is value- and
    SCHEMA-exact (incl. the TimestampNTZ family), writer modes mirror
    DataFrameWriter, and an empty frame round-trips its schema."""
    import pytest

    from blazingsql_spark.queries.registry import load_table
    from blazingsql_spark.sources.arrow_ipc import read_arrow_ipc, write_arrow_ipc

    li = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
        .limit(400)
        .repartition(4)
    )
    path = str(tmp_path / "li")
    n = write_arrow_ipc(li, path, compression="zstd")
    assert n == 4
    back = read_arrow_ipc(spark, path)
    assert back.schema == li.schema  # NTZ survives the round trip
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))

    with pytest.raises(ValueError, match="already has"):
        write_arrow_ipc(li, path, mode="error")
    write_arrow_ipc(li.limit(7), path, mode="append")
    assert read_arrow_ipc(spark, path).count() == 407
    write_arrow_ipc(li.limit(3), path, mode="overwrite")
    assert read_arrow_ipc(spark, path).count() == 3

    empty = str(tmp_path / "empty")
    assert write_arrow_ipc(li.limit(0), empty) == 1
    out = read_arrow_ipc(spark, empty)
    assert out.count() == 0 and out.schema == li.schema


def test_arrow_ipc_exact_values_and_schema_guard(spark, tmp_path):
    """The no-pandas read path must recover int64-with-nulls EXACTLY
    (pandas conversion floats them and corrupts ids past 2^53); a
    mixed-schema append fails loudly naming the file; mode='ignore'
    skips; unknown modes raise."""
    import pytest

    from blazingsql_spark.sources.arrow_ipc import read_arrow_ipc, write_arrow_ipc

    big = 2**53 + 1  # not representable as a double
    df = spark.createDataFrame(
        [(big, "a"), (None, "b"), (7, None)], "id long, s string"
    )
    p = str(tmp_path / "t")
    write_arrow_ipc(df, p)
    got = sorted(
        read_arrow_ipc(spark, p).collect(), key=lambda r: (r.id is None, r.id)
    )
    assert got[0].id == 7 and got[1].id == big and got[2].id is None

    assert write_arrow_ipc(df, p, mode="ignore") == 0
    assert read_arrow_ipc(spark, p).count() == 3
    with pytest.raises(ValueError, match="unknown write mode"):
        write_arrow_ipc(df, p, mode="overwite")

    # foreign-schema file appended: the read names the offender
    other = spark.createDataFrame([(1.5,)], "x double")
    write_arrow_ipc(other, p, mode="append")
    with pytest.raises(Exception, match="does not match the"):
        read_arrow_ipc(spark, p).collect()


def test_arrow_routing_read_any_write_any_create_table(spark, tmp_path):
    """Format routing: write_any/read_any dispatch 'arrow' (and infer it
    from .arrow/.feather extensions), Context.create_table registers a
    single .feather file written by plain pyarrow, and the option-refusal
    contracts mirror the avro source."""
    import pyarrow as pa
    import pyarrow.feather as feather
    import pytest

    from blazingsql_spark.queries.registry import load_table
    from blazingsql_spark.sources.io import read_any, write_any

    li = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .limit(50)
    )
    d = str(tmp_path / "li_arrow")
    write_any(li, d, file_format="arrow", compression="zstd")
    back = read_any(spark, d, file_format="arrow")
    assert back.count() == 50
    assert back.schema == li.schema

    with pytest.raises(NotImplementedError, match="reader schema/options"):
        read_any(spark, d, file_format="arrow", schema=li.schema)
    with pytest.raises(NotImplementedError, match="partitionBy/writer"):
        write_any(li, d, file_format="arrow", partition_by=["l_returnflag"])

    # a foreign single-file .feather (Feather V2 == IPC) registers via
    # create_table with the format inferred from the extension alone
    f = str(tmp_path / "dim.feather")
    feather.write_feather(
        pa.table({"k": [1, 2, 3], "name": ["a", "b", "c"]}), f
    )
    from blazingsql_spark import Context

    bc = Context(spark=spark)
    bc.create_table("dim_feather", f)
    got = sorted(bc.sql("SELECT k, name FROM dim_feather").collect())
    assert [(r.k, r.name) for r in got] == [(1, "a"), (2, "b"), (3, "c")]


def test_part_file_names_are_attempt_idempotent(spark, tmp_path, monkeypatch):
    """Executor-direct sinks (arrow IPC, avro OCF) must derive final part
    names from the write call's job id + the task's partitionId, NOT a
    fresh uuid per attempt: a retried/speculative task then re-renames
    onto the SAME file instead of leaving a duplicate part that later
    reads silently union in (ADVICE r8). Simulated here by pinning the
    job id so a second identical write IS a duplicate attempt."""
    import uuid as uuid_mod

    from blazingsql_spark.sources import arrow_ipc, avro_ocf

    df = (
        spark.range(40)
        .repartition(4)
        .selectExpr("id AS doc_id", "CAST(id * 2 AS DOUBLE) AS score")
    )

    # names embed the 5-digit partition id, one file per partition
    apath = str(tmp_path / "a")
    assert arrow_ipc.write_arrow_ipc(df, apath) == 4
    import os
    import re

    names = sorted(os.listdir(apath))
    assert all(re.fullmatch(r"part-[0-9a-f]{12}-\d{5}\.arrow", n) for n in names)
    assert {n.rsplit("-", 1)[1] for n in names} == {
        "00000.arrow", "00001.arrow", "00002.arrow", "00003.arrow"
    }

    # pin uuid4 -> the next append is byte-identical to a replayed attempt
    # set: file COUNT must not grow and the data must not double
    fixed = uuid_mod.UUID(int=0xABCDEF)
    monkeypatch.setattr(uuid_mod, "uuid4", lambda: fixed)
    for wpath, write, read, ext in (
        (str(tmp_path / "ar"), arrow_ipc.write_arrow_ipc,
         arrow_ipc.read_arrow_ipc, "arrow"),
        (str(tmp_path / "av"), avro_ocf.write_avro, avro_ocf.read_avro, "avro"),
    ):
        write(df, wpath)
        first = sorted(os.listdir(wpath))
        write(df, wpath, mode="append")  # duplicate attempt set
        assert sorted(os.listdir(wpath)) == first, ext
        assert read(spark, wpath).count() == 40, ext
        assert not [f for f in os.listdir(wpath) if f.endswith(".tmp")], ext
