"""Differential test: every registry query with an oracle must match DuckDB
exactly (the driver's t2 correctness gate, run locally at sf0.001)."""

from __future__ import annotations

import pytest

from blazingsql_spark.queries.registry import all_queries
from tests.conftest import assert_matches_oracle

_NAMES = sorted(n for n, s in all_queries().items() if s.oracle is not None)
_NO_ORACLE = sorted(n for n, s in all_queries().items() if s.oracle is None)


@pytest.mark.parametrize("name", _NAMES)
def test_matches_duckdb(spark, oracle, name):
    assert_matches_oracle(spark, oracle, name)


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_rows_only(spark, name):
    """Non-SQL-expressible ops: must run and return a stable schema."""
    from tests.conftest import SF_DIR

    df = all_queries()[name].fn(spark, SF_DIR)
    assert df.columns, f"{name}: no columns"
    assert df.count() >= 0
