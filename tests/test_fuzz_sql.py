"""Differential SQL fuzzing: hypothesis-generated queries from a
dialect-portable grammar run on BOTH engines (Spark and DuckDB) and must
agree under the strict driver-faithful compare (tests/conftest.py).

This widens correctness coverage beyond the 207 hand-written registry
pairs: the grammar samples the filter/aggregate/group-by surface the
reference's e2e suites hammer (BlazingSQLTest TestSuites combine the same
building blocks), but the combinations are fresh every run while staying
reproducible (hypothesis prints the failing example).

Grammar discipline for cross-engine exactness (the same rules the
registry oracles follow):
- integer aggregates wrapped CAST(... AS BIGINT) (DuckDB SUM(int) is
  HUGEINT — the round-3 driver-red class);
- no SUM/AVG over doubles (summation order is engine-dependent); MIN/MAX
  over doubles are exact and allowed;
- string and date literals from the actual TPC-H domains so predicates
  are selective but non-vacuous.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import compare_frames

INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
DBL_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]

_pred = st.one_of(
    st.tuples(st.sampled_from(INT_COLS), st.sampled_from(["<", "<=", ">", ">=", "<>"]),
              st.integers(1, 6000)).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
    st.tuples(st.sampled_from(DBL_COLS), st.sampled_from(["<", ">="]),
              st.floats(0.0, 50.0, allow_nan=False).map(lambda f: round(f, 2)))
    .map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
    st.sampled_from(["l_returnflag = 'A'", "l_returnflag = 'N'", "l_returnflag = 'R'",
                     "l_linestatus = 'O'", "l_linestatus = 'F'",
                     "l_shipdate >= '1996-01-01'", "l_shipdate < '1997-06-15'",
                     "l_quantity BETWEEN 5 AND 30",
                     "l_linenumber IN (1, 2, 3)"]),
)

_agg = st.one_of(
    st.just("CAST(COUNT(*) AS BIGINT) AS n"),
    st.sampled_from(INT_COLS).map(lambda c: f"CAST(SUM({c}) AS BIGINT) AS sum_{c}"),
    st.sampled_from(INT_COLS).map(lambda c: f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}"),
    st.sampled_from(DBL_COLS).map(lambda c: f"MIN({c}) AS min_{c}"),
    st.sampled_from(DBL_COLS).map(lambda c: f"MAX({c}) AS max_{c}"),
    st.sampled_from(INT_COLS).map(lambda c: f"CAST(MIN({c}) AS BIGINT) AS imin_{c}"),
)


@st.composite
def _query(draw):
    preds = draw(st.lists(_pred, min_size=1, max_size=3))
    conj = draw(st.sampled_from([" AND ", " OR "]))
    where = conj.join(preds)
    groups = draw(st.lists(st.sampled_from(GROUP_COLS), min_size=0, max_size=2,
                           unique=True))
    aggs = draw(st.lists(_agg, min_size=1, max_size=3, unique_by=lambda a: a.split(" AS ")[1]))
    select = ", ".join(groups + aggs)
    sql = f"SELECT {select} FROM lineitem WHERE {where}"
    if groups:
        sql += f" GROUP BY {', '.join(groups)} ORDER BY {', '.join(groups)}"
    return sql


@settings(max_examples=25, deadline=None)
@given(sql=_query())
def test_fuzzed_query_matches_duckdb(spark_fuzz, oracle_fuzz, sql):
    got = spark_fuzz.sql(sql).toPandas()
    want = oracle_fuzz.execute(sql).fetchdf()
    compare_frames(got, want, sql)


# session-scoped engine handles reused across examples (hypothesis calls
# the test many times per pytest item; fixtures must not rebuild Spark)
import duckdb  # noqa: E402
import pytest  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def spark_fuzz(spark):
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView("lineitem")
    return spark


@pytest.fixture(scope="module")
def oracle_fuzz():
    con = duckdb.connect()
    con.execute(
        f"CREATE OR REPLACE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    yield con
    con.close()
