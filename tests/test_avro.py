"""Avro OCF source/sink tests: codec round trips (every supported type,
both codecs, property-tested), corruption/typed-error paths, write modes,
and the distributed Spark read/write over multi-part layouts."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blazingsql_spark.queries.registry import load_table
from blazingsql_spark.sources import avro_ocf as av
from tests.conftest import SF_DIR

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": ["null", "long"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "b", "type": ["null", "boolean"]},
        {"name": "raw", "type": ["null", "bytes"]},
        {"name": "arr", "type": ["null", {"type": "array", "items": "float"}]},
    ],
}


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codec_roundtrip_all_types(codec):
    rows = [
        {"i": 2**62, "d": -1.5, "s": "héllo wörld", "b": True, "raw": b"\x00\xff", "arr": [1.5, -0.25]},
        {"i": -1, "d": float("inf"), "s": "", "b": False, "raw": b"", "arr": []},
        {"i": None, "d": None, "s": None, "b": None, "raw": None, "arr": None},
    ]
    blob = av.encode_ocf(rows, _SCHEMA, codec=codec)
    schema, back = av.decode_ocf(blob)
    assert schema == _SCHEMA
    assert back == rows


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "i": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
                "s": st.one_of(st.none(), st.text(max_size=40)),
            }
        ),
        max_size=30,
    )
)
def test_codec_roundtrip_property(rows):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "i", "type": ["null", "long"]},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    blob = av.encode_ocf(rows, schema, codec="deflate", block_rows=7)
    _s, back = av.decode_ocf(blob)
    assert back == rows


def test_multi_block_and_corruption():
    rows = [{"i": i, "s": str(i)} for i in range(100)]
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "i", "type": ["null", "long"]},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    blob = av.encode_ocf(rows, schema, block_rows=16)  # 7 blocks
    _s, back = av.decode_ocf(blob)
    assert back == rows
    with pytest.raises(ValueError, match="magic"):
        av.decode_ocf(b"NOPE" + blob[4:])
    # flip a byte inside the final sync marker
    broken = blob[:-1] + bytes([blob[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="sync"):
        av.decode_ocf(broken)
    with pytest.raises(ValueError, match="truncated"):
        av.decode_ocf(blob[:-20])


def test_unsupported_types_raise_by_name(spark):
    from pyspark.sql import types as T

    with pytest.raises(NotImplementedError, match="avro"):
        av.schema_to_avro(T.StructType([T.StructField("m", T.MapType(T.StringType(), T.LongType()))]))
    with pytest.raises(NotImplementedError, match="codec"):
        av.encode_ocf([], _SCHEMA, codec="snappy")


def test_spark_roundtrip_three_tables(spark, tmp_path):
    for tbl in ("documents", "events", "embeddings"):
        df = load_table(spark, SF_DIR, tbl)
        path = str(tmp_path / tbl)
        n_files = av.write_avro(df.repartition(3), path)
        assert n_files == 3  # one part per non-empty partition
        back = av.read_avro(spark, path)
        assert back.schema == df.schema
        key = df.columns[0]
        a = df.orderBy(key).toPandas()
        b = back.orderBy(key).toPandas()
        assert a.shape == b.shape
        for c in a.columns:
            assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), (tbl, c)


def test_spark_write_modes(spark, tmp_path):
    df = load_table(spark, SF_DIR, "documents").limit(50).coalesce(1)
    path = str(tmp_path / "modes")
    av.write_avro(df, path)
    av.write_avro(df, path, mode="overwrite")
    assert av.read_avro(spark, path).count() == 50  # no stale-part union
    av.write_avro(df, path, mode="append")
    assert av.read_avro(spark, path).count() == 100
    with pytest.raises(ValueError, match="already has"):
        av.write_avro(df, path, mode="error")


def test_date_type_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    df = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("d"))
        .limit(100)
    )
    path = str(tmp_path / "dates")
    av.write_avro(df, path)
    back = av.read_avro(spark, path)
    assert dict(back.dtypes)["d"] == "date"
    a = {r.o_orderkey: r.d for r in df.collect()}
    b = {r.o_orderkey: r.d for r in back.collect()}
    assert a == b and all(isinstance(v, dt.date) for v in b.values())


def test_context_facade_avro(spark, tmp_path):
    """BlazingContext-style surface: write_any/read_any/create_table route
    .avro through the zero-dependency OCF source instead of the absent
    spark-avro module."""
    from blazingsql_spark.context import Context
    from blazingsql_spark.sources.io import read_any, write_any

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "facade")
    write_any(docs, path, file_format="avro")
    assert read_any(spark, path, file_format="avro").count() == docs.count()
    bc = Context(spark=spark)
    bc.create_table("docs_avro_facade", path, file_format="avro")
    n = bc.sql("SELECT COUNT(*) AS n FROM docs_avro_facade").collect()[0].n
    assert n == docs.count()
    bc.drop_table("docs_avro_facade")


def test_array_null_elements_roundtrip(spark, tmp_path):
    """Review finding: null elements inside arrays were stringified or
    crashed the encoder — they must round-trip as nulls."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2],
                "tags": [["x", None, "y"], None],
                "nums": [[1.5, None], [None]],
            }
        ),
        schema="id long, tags array<string>, nums array<double>",
    )
    path = str(tmp_path / "nullelems")
    av.write_avro(df, path)
    got = {r.id: (r.tags, r.nums) for r in av.read_avro(spark, path).collect()}
    assert got[1] == (["x", None, "y"], [1.5, None])
    assert got[2] == (None, [None])


def test_empty_dataframe_roundtrip(spark, tmp_path):
    """Review finding: an empty write produced zero files and the read
    crashed — now one zero-block file persists the schema."""
    df = load_table(spark, SF_DIR, "documents").limit(0)
    path = str(tmp_path / "empty")
    assert av.write_avro(df, path) == 1
    back = av.read_avro(spark, path)
    assert back.count() == 0
    assert back.schema == df.schema


def test_empty_dir_and_uri_scheme_are_typed_errors(spark, tmp_path):
    import os

    d = str(tmp_path / "nothing")
    os.makedirs(d)
    with pytest.raises(ValueError, match="no .avro files"):
        av.read_avro(spark, d)
    with pytest.raises(NotImplementedError, match="POSIX"):
        av.write_avro(load_table(spark, SF_DIR, "documents"), "hdfs://nn/x")
    with pytest.raises(NotImplementedError, match="POSIX"):
        av.read_avro(spark, "s3a://bucket/x")


def test_cross_file_schema_mismatch_raises_naming_file(spark, tmp_path):
    """ADVICE r6: a directory mixing OCF files with DIFFERENT embedded
    schemas must raise a ValueError naming the offending file, never
    silently NULL-fill renamed fields through the by-name remap."""
    import os
    import shutil

    a = spark.createDataFrame([(1, "x")], ["id", "name"])
    b = spark.createDataFrame([(2, "y")], ["id", "label"])  # renamed field
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    av.write_avro(a, da)
    av.write_avro(b, db)
    rogue = [f for f in os.listdir(db) if f.endswith(".avro")][0]
    shutil.copy(
        os.path.join(db, rogue), os.path.join(da, "part-rogue.avro")
    )
    with pytest.raises(Exception, match="schema mismatch.*part-rogue"):
        av.read_avro(spark, da).collect()
    # homogeneous directories still read fine after the check
    assert av.read_avro(spark, db).count() == 1


def test_read_any_avro_refuses_schema_and_options(spark, tmp_path):
    from blazingsql_spark.sources.io import read_any, write_any

    docs = load_table(spark, SF_DIR, "documents").limit(5)
    path = str(tmp_path / "refuse")
    write_any(docs, path, file_format="avro")
    with pytest.raises(NotImplementedError, match="schema"):
        read_any(spark, path, file_format="avro", schema=docs.schema)
    with pytest.raises(NotImplementedError, match="options"):
        write_any(docs, path, file_format="avro", compression="snappy")


def test_nan_array_elements_roundtrip_row_path():
    """Second review pass: real NaN must survive the Row-based (pyds)
    encode path; only the pandas path coerces NaN->null (Arrow hands
    nulls back as NaN there — indistinguishable)."""
    import math

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "nums", "type": ["null", {"type": "array", "items": ["null", "double"]}]}
        ],
    }
    rows = [{"nums": [1.0, float("nan"), None]}]
    blob = av.encode_ocf(rows, schema, nan_as_null=False)
    _s, back = av.decode_ocf(blob)
    got = back[0]["nums"]
    assert got[0] == 1.0 and math.isnan(got[1]) and got[2] is None


def test_tz_aware_timestamp_encodes_utc_instant():
    import datetime as dt

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "ts", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]}],
    }
    plus2 = dt.timezone(dt.timedelta(hours=2))
    aware = dt.datetime(2026, 1, 1, 12, 0, tzinfo=plus2)  # = 10:00 UTC
    blob = av.encode_ocf([{"ts": aware}], schema)
    _s, back = av.decode_ocf(blob)
    expected = int(dt.datetime(2026, 1, 1, 10, 0, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert back[0]["ts"] == expected


def test_read_header_schema_is_header_only(tmp_path):
    """Planning must not decompress data blocks: a file whose block
    payload is CORRUPT still yields its schema."""
    docs_schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "i", "type": ["null", "long"]}],
    }
    blob = bytearray(av.encode_ocf([{"i": 1}] * 100, docs_schema))
    blob[-20] ^= 0xFF  # corrupt inside the last block's payload
    f = tmp_path / "x.avro"
    f.write_bytes(bytes(blob))
    assert av.read_header_schema(str(f)) == docs_schema
