"""TPC-H q2/q9/q11/q20 — the four queries needing ``partsupp``, which the
driver's fixture set does not ship (TESTDATA.md; reference exercises them
via tests/BlazingSQLTest/EndToEndTests/TestSuites/TPCHSuite.yaml with the
full schema from tests/BlazingSQLTest/DataBase/createSchema.py:31-40).

Because no partsupp parquet exists under /root/testdata, these are NOT in
the driver registry (a registry entry would fail its driver run). Instead:

- ``generate_partsupp`` builds a deterministic partsupp with the TPC-H
  supplier-spreading formula (4 suppliers per part, offset-striped across
  the supplier range — dbgen's PS_SUPPKEY rule) and hash-derived
  availqty/supplycost — pure Spark expressions, no RNG, reproducible.
- ``EXTRA_QUERIES`` maps each query to twin ANSI SQL runnable by BOTH
  Spark and DuckDB over (fixture tables + generated partsupp);
  tests/test_tpch_extra.py materializes that layout in a tmp dir and
  differential-tests all four, same discipline as the main registry.

Queries are adapted to the driver's compact schema (no p_mfgr, s_address,
s_phone, s_comment columns) and its 0-based keys; aggregate spellings use
the exact-integer grids the main suite uses so cross-engine hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blazingsql_spark.queries.registry import load_table


def generate_partsupp(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Write a deterministic partsupp.parquet for ``sf_dir``'s part/supplier.

    dbgen semantics: each part has 4 partsupp rows; supplier i of part p
    follows dbgen's PS_SUPPKEY spreading rule adapted for small supplier
    counts — (p + p DIV S + i*(S/4)) mod S, i.e. the rotating base keeps
    dbgen's "spread a part's suppliers across the key space" property while
    the constant per-i stride keeps the 4 suppliers of a part DISTINCT for
    any S >= 8 (dbgen's per-i (p-1)/S term collides mod tiny S). availqty
    (1..9999) and supplycost (1.00..1000.00, exact cents) derive from
    xxhash64 — stable across runs/engines, no RNG.
    """
    supp_count = load_table(spark, sf_dir, "supplier").count()
    s4 = max(supp_count // 4, 1)
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("ps_partkey")
    )
    ps = (
        part.select(
            "ps_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("__i"),
        )
        .select(
            "ps_partkey",
            F.expr(
                f"(ps_partkey + ps_partkey DIV {supp_count} + __i * {s4}) % {supp_count}"
            ).cast("long").alias("ps_suppkey"),
        )
        .withColumn(
            "ps_availqty",
            (F.pmod(F.xxhash64("ps_partkey", "ps_suppkey"), F.lit(9999)) + 1).cast("int"),
        )
        .withColumn(
            "ps_supplycost",
            (
                (F.pmod(F.xxhash64("ps_suppkey", "ps_partkey", F.lit(7)), F.lit(99900)) + 100)
                .cast("double")
                / 100.0
            ),
        )
    )
    ps.write.mode("overwrite").parquet(out_path)


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
                     * 0.001
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
