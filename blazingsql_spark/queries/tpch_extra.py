"""TPC-H q2/q9/q11/q20 — the four queries needing ``partsupp``, which the
driver's fixture set does not ship (TESTDATA.md; reference exercises them
via tests/BlazingSQLTest/EndToEndTests/TestSuites/TPCHSuite.yaml with the
full schema from tests/BlazingSQLTest/DataBase/createSchema.py:31-40).

No partsupp parquet exists under /root/testdata, so partsupp is GENERATED
deterministically from the fixture's own part/supplier tables:

- 4 partsupp rows per part; supplier i of part p follows dbgen's
  PS_SUPPKEY spreading rule adapted for small supplier counts —
  (p + p/S + i*(S/4)) mod S — keeping dbgen's "spread a part's suppliers
  across the key space" property while the constant per-i stride keeps the
  4 suppliers of a part DISTINCT for any S >= 8.
- availqty (1..9999) and supplycost (1.00..1000.00, exact cents) derive
  from prime-multiplier modular arithmetic on (partkey, suppkey) — pure
  ANSI integer math that Spark and DuckDB evaluate IDENTICALLY, so the
  generator itself can live in a twin SQL CTE (``PARTSUPP_CTE``) and the
  four queries take normal driver oracle rows: both engines build the same
  partsupp inline and the query comparison is exact.

``generate_partsupp`` materializes the same rows as parquet (used by
tests/test_tpch_extra.py to also differential-test the materialized
layout). Queries are adapted to the driver's compact schema (no p_mfgr,
s_address, s_phone, s_comment columns) and its 0-based keys; aggregate
spellings use the exact-integer grids the main suite uses so cross-engine
hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from blazingsql_spark.queries.registry import load_table, twin

# Engine-portable partsupp generator (see module docstring). ANSI-only
# spellings: floor-division via FLOOR(x/y) on doubles (exact for key ranges
# << 2^53), 0..3 via UNION ALL (inline VALUES syntax differs per dialect).
PARTSUPP_CTE = """
WITH __sc AS (
    SELECT COUNT(*) AS s,
           GREATEST(CAST(FLOOR(COUNT(*) / 4.0) AS BIGINT), 1) AS s4
    FROM supplier
),
__i AS (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           CAST((ps_partkey * 7919 + ps_suppkey * 104729) % 9999 + 1 AS INT)
               AS ps_availqty,
           CAST((ps_partkey * 104729 + ps_suppkey * 7919 + 7) % 99900 + 100
                AS DOUBLE) / 100 AS ps_supplycost
    FROM (
        SELECT p_partkey AS ps_partkey,
               (p_partkey
                + CAST(FLOOR(CAST(p_partkey AS DOUBLE) / s) AS BIGINT)
                + i * s4) % s AS ps_suppkey
        FROM part, __sc, __i
    ) __keys
)
"""


def generate_partsupp(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Write the PARTSUPP_CTE rows as partsupp.parquet for ``sf_dir``."""
    for t in ("part", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    spark.sql(PARTSUPP_CTE + "SELECT * FROM partsupp").write.mode(
        "overwrite"
    ).parquet(out_path)


# Twin ANSI SQL — identical text runs on Spark and DuckDB.
EXTRA_QUERIES: dict[str, str] = {
    # Q2: min-cost supplier per part in a region (correlated scalar subquery).
    "tpch_q2": """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part, supplier, partsupp, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size <= 15 AND p_type = 'LARGE'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND ps_supplycost = (
            SELECT MIN(ps_supplycost)
            FROM partsupp, supplier, nation, region
            WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    # Q9: product-type profit by nation and year. amount = revenue - supply
    # cost; summed on an exact integer cent grid so chunked/partial
    # aggregation order cannot flip low bits across engines.
    "tpch_q9": """
    SELECT nation, o_year,
           CAST(SUM(CAST(FLOOR(amount * 100) AS DECIMAL(18,0))) AS DOUBLE) / 100
               AS sum_profit
    FROM (
        SELECT n_name AS nation,
               EXTRACT(YEAR FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity
                   AS amount
        FROM part, supplier, lineitem, partsupp, orders, nation
        WHERE s_suppkey = l_suppkey
          AND ps_suppkey = l_suppkey AND ps_partkey = l_partkey
          AND p_partkey = l_partkey AND o_orderkey = l_orderkey
          AND s_nationkey = n_nationkey
          AND p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    # Q11: important stock per nation group. Value computed on the integer
    # cent grid (supplycost is exact cents by construction), so the HAVING
    # threshold compares deterministic integers, not order-dependent floats.
    # The share threshold is ADAPTIVE (1.2x the mean per-part share,
    # spelled 1.2 / COUNT(part)) — TPC-H's own spec scales the fraction by
    # 1/SF for the same reason: a fixed 0.001 empties the result once the
    # part count crosses ~1/0.001 (r11 vacuity assert caught exactly that
    # at sf0.1: 20k parts, mean share 5e-5, zero rows).
    "tpch_q11": """
    SELECT ps_partkey,
           CAST(SUM(CAST(FLOOR(ps_supplycost * 100 + 0.5) AS BIGINT) * ps_availqty)
                AS DOUBLE) / 100 AS value
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
    GROUP BY ps_partkey
    HAVING SUM(CAST(FLOOR(ps_supplycost * 100 + 0.5) AS BIGINT) * ps_availqty)
           > (SELECT SUM(CAST(FLOOR(ps_supplycost * 100 + 0.5) AS BIGINT) * ps_availqty)
                     * 1.2 / (SELECT COUNT(*) FROM part)
              FROM partsupp, supplier, nation
              WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
                AND n_name IN ('NATION_3', 'NATION_4', 'NATION_5'))
    ORDER BY value DESC, ps_partkey
    """,
    # Q20: suppliers with excess stock of promoted parts (nested IN +
    # correlated scalar subquery over lineitem). l_quantity is integral, so
    # 0.5*SUM is exact — the > compare is deterministic.
    "tpch_q20": """
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps_suppkey
        FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
          AND ps_availqty > (
                SELECT 0.5 * SUM(l_quantity)
                FROM lineitem
                WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                  AND l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate <  DATE '1997-01-01'))
      AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_3', 'NATION_4', 'NATION_5', 'NATION_6')
    ORDER BY s_name
    """,
}

_TABLES = ("part", "supplier", "partsupp", "nation", "region", "orders", "lineitem")


def run_extra(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Run one EXTRA query over ``sf_dir`` (which must contain partsupp —
    see generate_partsupp)."""
    for t in _TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(EXTRA_QUERIES[name])


# Driver registration: each query prefixed with the inline generator CTE
# (shadows any partsupp view in both dialects), so the driver can record
# normal oracle rows for full 22-query TPC-H parity.
for _name, _sql in EXTRA_QUERIES.items():
    twin(
        _name,
        PARTSUPP_CTE + _sql,
        tables=("part", "supplier", "nation", "region", "orders", "lineitem"),
        doc=f"TPC-H {_name[5:]} over inline-generated partsupp (dbgen spreading rule)",
    )
