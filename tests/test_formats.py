"""Cross-format e2e: the reference runs every suite over CSV/Parquet/ORC/JSON
(SKIP_WITH matrix, TPCHSuite.yaml:13-21). Here: convert lineitem once per
format, run the TPC-H Q1 SQL over each, and require identical results."""

from __future__ import annotations

import pytest

from blazingsql_spark.context import Context
from blazingsql_spark.queries.registry import all_queries, load_table
from tests.conftest import SF_DIR, normalize

Q1 = all_queries()["tpch_q1"]


@pytest.fixture(scope="module")
def parquet_result(spark):
    return normalize(Q1.fn(spark, SF_DIR).toPandas())


@pytest.mark.parametrize("fmt", ["orc", "csv", "json", "xml"])
def test_q1_same_result_across_formats(spark, tmp_path_factory, parquet_result, fmt):
    import pandas as pd

    bc = Context(spark=spark)
    src = load_table(spark, SF_DIR, "lineitem")
    out = str(tmp_path_factory.mktemp("fmt") / f"lineitem_{fmt}")
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        # preserve timestamp fidelity through text
        writer = writer.option("header", True).option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        )
    elif fmt == "xml":  # built-in data source since Spark 4.0
        writer = writer.option("rowTag", "row").option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        )
    writer.format(fmt).save(out)

    kwargs = {}
    if fmt == "csv":
        kwargs = {"schema": src.schema, "header": True,
                  "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"}
    elif fmt == "json":
        kwargs = {"schema": src.schema}
    elif fmt == "xml":
        kwargs = {"schema": src.schema, "rowTag": "row",
                  "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"}
    bc.create_table("lineitem", out, file_format=fmt, **kwargs)
    got = normalize(bc.sql(Q1.fn.sql).toPandas())
    pd.testing.assert_frame_equal(got, parquet_result, check_dtype=False)


def test_bsql_logs(spark):
    bc = Context(spark=spark)
    bc.create_table("n1", f"{SF_DIR}/nation.parquet")
    bc.sql("SELECT COUNT(*) AS n FROM n1").collect()
    bc.sql("SELECT MAX(n_nationkey) AS m FROM n1").collect()
    logs = bc.log("SELECT query, status FROM bsql_logs ORDER BY log_id").collect()
    assert len(logs) == 2
    assert all(r.status == "planned" for r in logs)


def test_io_format_matrix_staged_oracle(spark, oracle):
    """The r6-staged driver query for the non-parquet parsers
    (queries/formats.py, VERDICT r4 #5): importing the module registers
    io_format_matrix; it must pass the full driver-faithful compare NOW so
    the r6 registration flip is risk-free."""
    import blazingsql_spark.queries.formats  # noqa: F401  (self-registers)

    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle, "io_format_matrix")
