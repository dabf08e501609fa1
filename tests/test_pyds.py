"""Python DataSource API registrations (Spark 4): avro_ocf and webdataset
as first-class spark.read/write formats — partition planning, the staged
commit protocol, and typed-column round trips."""

from __future__ import annotations

import os

import pytest

from blazingsql_spark.queries.registry import load_table
from blazingsql_spark.sources.pyds import register_data_sources
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def pyds_spark(spark):
    register_data_sources(spark)
    return spark


@pytest.mark.parametrize("tbl", ["documents", "events", "embeddings"])
def test_avro_ocf_format_roundtrip(pyds_spark, tmp_path, tbl):
    spark = pyds_spark
    df = load_table(spark, SF_DIR, tbl)
    path = str(tmp_path / tbl)
    df.repartition(3).write.format("avro_ocf").mode("overwrite").save(path)
    files = os.listdir(path)
    assert len([f for f in files if f.endswith(".avro")]) == 3
    assert not any(f.endswith(".staged") for f in files)  # commit published all
    back = spark.read.format("avro_ocf").load(path)
    assert back.schema == df.schema
    key = df.columns[0]
    a = df.orderBy(key).toPandas()
    b = back.orderBy(key).toPandas()
    for c in a.columns:
        assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), (tbl, c)


def test_avro_ocf_overwrite_replaces(pyds_spark, tmp_path):
    spark = pyds_spark
    docs = load_table(spark, SF_DIR, "documents").limit(20).coalesce(1)
    path = str(tmp_path / "ovw")
    # the Python DataSource API supports only Append/Overwrite modes
    docs.write.format("avro_ocf").mode("append").save(path)
    docs.write.format("avro_ocf").mode("append").save(path)
    assert spark.read.format("avro_ocf").load(path).count() == 40
    docs.write.format("avro_ocf").mode("overwrite").save(path)
    assert spark.read.format("avro_ocf").load(path).count() == 20


def test_avro_ocf_abort_leaves_no_partial_output(pyds_spark, tmp_path):
    """A failing write task must not publish readable output — the staged
    commit protocol's whole point."""
    from pyspark.sql import functions as F

    spark = pyds_spark
    path = str(tmp_path / "abort")
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    poisoned = docs.withColumn(
        "boom", F.udf(lambda i: 1 // (1 if i < 49 else 0), "int")("doc_id")
    )
    with pytest.raises(Exception, match="division|Python"):
        # explicit append mode so the failure comes from the poisoned TASK,
        # not an unsupported-save-mode analysis error (which would pass
        # this test without ever exercising abort())
        poisoned.write.format("avro_ocf").mode("append").save(path)
    leftover = [f for f in os.listdir(path) if f.endswith(".avro")] if os.path.isdir(path) else []
    assert leftover == []  # nothing published


def test_webdataset_format(pyds_spark, tmp_path):
    import io
    import tarfile

    from pyspark.sql import functions as F

    spark = pyds_spark
    for s in range(2):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for k in range(3):
                data = f"doc {s}-{k}".encode()
                info = tarfile.TarInfo(f"{s}{k:03d}.txt")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        (tmp_path / f"s{s}.tar").write_bytes(buf.getvalue())
    w = spark.read.format("webdataset").load(str(tmp_path))
    assert w.count() == 6
    assert w.rdd.getNumPartitions() == 2  # one InputPartition per shard
    txt = w.select(
        F.element_at("payloads", F.array_position("exts", "txt").cast("int"))
        .cast("string")
        .alias("t")
    ).collect()
    assert sorted(r.t for r in txt) == [f"doc {s}-{k}" for s in range(2) for k in range(3)]


def test_webdataset_routing_through_read_any_and_create_table(pyds_spark, tmp_path):
    """Format routing: read_any(file_format='webdataset') and
    Context.create_table register shard directories through the
    DataSource API; reader options are refused like the avro source."""
    import io
    import tarfile

    import pytest

    from blazingsql_spark.sources.io import read_any

    spark = pyds_spark
    for s in range(2):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for k in range(3):
                data = f"doc {s}-{k}".encode()
                info = tarfile.TarInfo(f"{s}{k:03d}.txt")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
        (tmp_path / f"s{s}.tar").write_bytes(buf.getvalue())
    got = read_any(spark, str(tmp_path), file_format="webdataset")
    assert got.count() == 6
    with pytest.raises(NotImplementedError, match="reader schema/options"):
        read_any(spark, str(tmp_path), file_format="webdataset", pathGlobFilter="*")

    from blazingsql_spark import Context

    bc = Context(spark=spark)
    bc.create_table("shards", str(tmp_path), file_format="webdataset")
    assert bc.sql("SELECT COUNT(*) AS n FROM shards").first()["n"] == 6
