"""Differential tests for TPC-H q2/q9/q11/q20 over a generated partsupp —
the four queries the driver fixture can't check (no partsupp.parquet).
Same Spark-vs-DuckDB exact-compare discipline as tests/test_oracle.py."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from blazingsql_spark.queries.tpch_extra import (
    EXTRA_QUERIES,
    generate_partsupp,
    run_extra,
)
from tests.conftest import SF_DIR, normalize


@pytest.fixture(scope="module")
def extra_sf_dir(spark, tmp_path_factory):
    """A tmp sf-dir: symlinks to the fixture tables + generated partsupp."""
    d = tmp_path_factory.mktemp("sf_extra")
    for t in ("part", "supplier", "nation", "region", "orders", "lineitem"):
        os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    generate_partsupp(spark, SF_DIR, str(d / "partsupp.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def extra_oracle(extra_sf_dir):
    con = duckdb.connect()
    for t in ("part", "supplier", "nation", "region", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{extra_sf_dir}/{t}.parquet')"
        )
    # Spark writes partsupp as a directory of part-files
    con.execute(
        "CREATE VIEW partsupp AS SELECT * FROM "
        f"read_parquet('{extra_sf_dir}/partsupp.parquet/*.parquet')"
    )
    yield con
    con.close()


def test_partsupp_shape(spark, extra_sf_dir):
    ps = spark.read.parquet(f"{extra_sf_dir}/partsupp.parquet")
    n_parts = spark.read.parquet(f"{extra_sf_dir}/part.parquet").count()
    assert ps.count() == 4 * n_parts  # dbgen: 4 suppliers per part
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == ps.count()
    # regeneration is bit-stable (hash-derived, no RNG)
    rows = {tuple(r) for r in ps.collect()}
    ps2 = spark.read.parquet(f"{extra_sf_dir}/partsupp.parquet")
    assert {tuple(r) for r in ps2.collect()} == rows


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_matches_duckdb(spark, extra_sf_dir, extra_oracle, name):
    got = normalize(run_extra(spark, extra_sf_dir, name).toPandas())
    want = normalize(extra_oracle.execute(EXTRA_QUERIES[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert len(want) > 0, f"{name}: vacuous (oracle returned no rows)"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)
