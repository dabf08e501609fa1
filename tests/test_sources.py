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
