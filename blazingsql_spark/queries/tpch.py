"""TPC-H-style headline queries, adapted to the driver's compact schema
(TESTDATA.md: no partsupp, fewer columns). These mirror the reference's
primary e2e suite (/root/reference/tests/BlazingSQLTest/EndToEndTests/
TestSuites/TPCHSuite.yaml) and exercise the full relational core:
scan→filter→join→agg→sort→limit with Catalyst doing pushdown/broadcast.

All are `twin`s — Spark SQL and DuckDB accept identical ANSI text.
"""

from blazingsql_spark.queries.registry import twin

# Q1: pricing summary — wide aggregate, 2-key group, the flagship.
# Reference plan: BindableTableScan→ComputeAggregate→Distribute→Merge
# (SURVEY.md §2.1); Spark: partial+final HashAggregate with pushed filter.
twin(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000                AS sum_disc_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000  AS sum_charge,
           ROUND(ROUND(SUM(l_quantity), 2)      / COUNT(l_quantity), 6)      AS avg_qty,
           ROUND(ROUND(SUM(l_extendedprice), 2) / COUNT(l_extendedprice), 6) AS avg_price,
           ROUND(ROUND(SUM(l_discount), 2)      / COUNT(l_discount), 6)      AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tables=("lineitem",),
    headline=True,
)

# Q3: shipping priority — 3-way join, filter each side, group, top-N.
twin(
    "tpch_q3",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15'
      AND l_shipdate  > DATE '1996-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, o_orderkey
    LIMIT 10
    """,
    tables=("customer", "orders", "lineitem"),
    headline=True,
)

# Q4: order priority checking — correlated EXISTS (reference handles via
# Calcite decorrelation into a semi-ish join, SURVEY.md §2.2; Spark plans a
# left-semi join natively).
twin(
    "tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1996-07-01'
      AND o_orderdate <  DATE '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tables=("orders", "lineitem"),
    headline=True,
)

# Q5: local supplier volume — 6-way star join through region/nation.
twin(
    "tpch_q5",
    """
    SELECT n_name, CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tables=("customer", "orders", "lineitem", "supplier", "nation", "region"),
    headline=True,
)

# Q6: forecasting revenue change — pure scan+filter+global agg; the pushdown
# showcase (filters reach the parquet reader).
twin(
    "tpch_q6",
    """
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000 AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tables=("lineitem",),
    headline=True,
)

# Q10: returned item reporting — join + group over many keys + top-N.
twin(
    "tpch_q10",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000 AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tables=("customer", "orders", "lineitem", "nation"),
    headline=True,
)

# Q12-style: shipping modes and order priority — conditional aggregation.
twin(
    "tpch_q12",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tables=("orders", "lineitem"),
)

# Q13: customer distribution — outer join with join-condition filter,
# double aggregation.
twin(
    "tpch_q13",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tables=("customer", "orders"),
    headline=True,
)

# Q14: promotion effect — join + conditional ratio aggregate.
twin(
    "tpch_q14",
    """
    SELECT ROUND(100.00 *
                 (CAST(SUM(CAST(FLOOR(CASE WHEN p_type = 'PROMO'
                                           THEN l_extendedprice * (1 - l_discount)
                                           ELSE 0 END * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000)
                 / (CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000), 2) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-09-01'
      AND l_shipdate <  DATE '1996-10-01'
    """,
    tables=("lineitem", "part"),
)

# Q15-style: top supplier by revenue — CTE + scalar subquery on an aggregate.
twin(
    "tpch_q15",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tables=("supplier", "lineitem"),
)

# Q16-style: supplier relationship — NOT IN subquery + COUNT DISTINCT.
twin(
    "tpch_q16",
    """
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#4'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    LIMIT 20
    """,
    tables=("lineitem", "part", "supplier"),
)

# Q17-style: small-quantity-order revenue — correlated scalar subquery.
twin(
    "tpch_q17",
    # Decorrelated by hand: the naive correlated form makes Spark aggregate
    # ALL of lineitem by partkey, but only Brand#3 partkeys (~1/25) can
    # survive the outer join. Semi-joining lineitem with the filtered part
    # set BEFORE the per-partkey average cuts the aggregate's input by the
    # brand selectivity — the difference between scanning 100 TB and 4 TB
    # into that shuffle. Same per-partkey averages, same result.
    """
    WITH brand_parts AS (
        SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'
    ),
    thresholds AS (
        SELECT l_partkey,
               0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(l_quantity)) AS qty_threshold
        FROM lineitem JOIN brand_parts ON p_partkey = l_partkey
        GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN thresholds ON lineitem.l_partkey = thresholds.l_partkey
    WHERE l_quantity < qty_threshold
    """,
    tables=("lineitem", "part"),
    headline=True,
)

# Q18: large volume customer — aggregate + HAVING + joins + top-N.
# Written aggregate-first: lineitem collapses to the o_orderkey grain BEFORE
# the joins (o_orderkey functionally determines the other group keys, so
# grouping by all five after the join — the textbook spelling — computes the
# same result while shuffling the full join output; Catalyst doesn't do this
# rewrite itself). At 100 TB this is the difference between joining 6B rows
# and joining the handful of qualifying orders.
twin(
    "tpch_q18",
    """
    WITH big_orders AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big_orders
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tables=("customer", "orders", "lineitem"),
    headline=True,
)

# Q19-style: discounted revenue — disjunctive multi-predicate join filter
# (the reference splits this into equi-join + post-filter,
# BatchJoinProcessing.cpp:148-250; Catalyst handles natively).
twin(
    "tpch_q19",
    """
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000 AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    tables=("lineitem", "part"),
)

# Q7: volume shipping — two-nation flows, EXTRACT in group keys. Nation
# literals + date range adapted to the fixture (NATION_13/NATION_19 trade
# at every SF incl. sf0.001) so the oracle row is non-vacuous (>0 rows).
twin(
    "tpch_q7",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(FLOOR(volume * 10000) AS DECIMAL(18,0))) AS DOUBLE) / 10000 AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               YEAR(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
            OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
          AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1998-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tables=("supplier", "lineitem", "orders", "customer", "nation"),
)

# Q8: market share — conditional ratio over a 7-way join.
twin(
    "tpch_q8",
    """
    SELECT o_year,
           ROUND(
               CAST(SUM(CAST(FLOOR(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END * 10000)
                        AS DECIMAL(18,0))) AS DOUBLE)
               / CAST(SUM(CAST(FLOOR(volume * 10000) AS DECIMAL(18,0))) AS DOUBLE), 6)
               AS mkt_share
    FROM (
        SELECT YEAR(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
          AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tables=("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
)

# Q21-style: suppliers whose lineitems shipped late on multi-supplier orders
# — EXISTS + NOT EXISTS correlated pair (adapted: no commit/receipt dates).
twin(
    "tpch_q21",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    tables=("supplier", "lineitem", "orders"),
)

# Q22-style: customers above-average balance with no orders — scalar
# subquery + anti join (adapted: acctbal segments instead of phone codes).
twin(
    "tpch_q22",
    """
    SELECT c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS DECIMAL(18,0))) AS DOUBLE) / 100 AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                              / COUNT(c2.c_acctbal)
                       FROM customer c2 WHERE c2.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tables=("customer", "orders"),
)
