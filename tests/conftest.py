"""Shared fixtures: one local SparkSession per test run, DuckDB oracle helper.

Differential-testing scheme mirrors the reference's e2e harness
(/root/reference/tests/BlazingSQLTest/Runner/runTest.py: run_query :1078
vs run_query_spark/:971 with compare_result_values :113) with DuckDB as the
oracle engine and exact value comparison (the driver hashes values, so we
test the strictest form locally).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blazingsql_spark.queries.registry import TABLES, all_queries  # noqa: E402
from blazingsql_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(app_name="blazingsql_spark_tests", master="local[4]")
    yield spark


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — the driver's
    order-insensitive compare, reproduced strictly."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            pdf[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("Int64")
        elif s.dtype == object:
            pdf[c] = s.map(_canon_cell)
    pdf = pdf.sort_values(by=list(pdf.columns), key=_sort_key, kind="mergesort")
    return pdf.reset_index(drop=True)


def _canon_cell(v):
    import datetime
    import decimal

    import numpy as np

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.replace(tzinfo=None)
    return v


def _sort_key(s: pd.Series) -> pd.Series:
    if s.dtype == object:
        return s.map(repr)
    return s


def assert_matches_oracle(spark, oracle, name: str, sf_dir: str = SF_DIR) -> None:
    spec = all_queries()[name]
    assert spec.oracle is not None, f"{name} has no oracle"
    got = normalize(spec.fn(spark, sf_dir).toPandas())
    want = normalize(oracle.execute(spec.oracle).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)
