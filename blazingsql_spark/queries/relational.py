"""Relational operator coverage: joins (SURVEY §2.2), aggregations (§2.3),
window functions (§2.4), sorts/limits (§2.5), set operations (§2.6), and the
events-table time operators. One registry entry per reference test suite
(innerJoinsSuite, fullOuterJoinsSuite, groupBySuite, windowFunctionSuite,
unionSuite, limitSuite, ... — /root/reference/tests/BlazingSQLTest/
EndToEndTests/TestSuites/)."""

from pyspark.sql import functions as F

from blazingsql_spark.queries.registry import load_table, pair, register, twin

# ----------------------------------------------------------------- joins

twin(
    "join_inner",
    """
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000
    ORDER BY o_orderkey
    """,
    tables=("orders", "customer"),
)

twin(
    "join_left",
    """
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'P'
    ORDER BY c_custkey, o_orderkey
    """,
    tables=("customer", "orders"),
)

twin(
    "join_right",
    """
    SELECT s_suppkey, s_name, n_name
    FROM nation RIGHT JOIN supplier ON n_nationkey = s_nationkey
    ORDER BY s_suppkey
    """,
    tables=("nation", "supplier"),
)

twin(
    "join_full_outer",
    """
    SELECT COALESCE(c.nk, s.nk) AS nationkey, c.cust_cnt, s.supp_cnt
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS cust_cnt FROM customer GROUP BY c_nationkey) c
    FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS supp_cnt FROM supplier GROUP BY s_nationkey) s
      ON c.nk = s.nk
    ORDER BY nationkey
    """,
    tables=("customer", "supplier"),
)

twin(
    "join_cross",
    """
    SELECT r_name, st.o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) st
    ORDER BY r_name, o_orderstatus
    """,
    tables=("region", "orders"),
)


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def join_semi(spark, sf_dir):
    """LEFT SEMI join (EXISTS). The reference has no semi-join kernel —
    Calcite decorrelates EXISTS into inner join + agg (SURVEY §2.2); Spark
    plans a real LeftSemi, strictly better (no duplicate-elimination agg)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def join_anti(spark, sf_dir):
    """LEFT ANTI join (NOT EXISTS) — also absent in the reference engine.
    The anti side is pre-filtered to big-ticket orders so the difference is
    non-empty at every SF (the unfiltered form was vacuous: every customer
    has at least one order in this fixture)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_nullsafe",
    oracle="""
    SELECT c_custkey, n_name
    FROM customer JOIN nation
      ON NULLIF(c_nationkey, 3) IS NOT DISTINCT FROM NULLIF(n_nationkey, 3)
    ORDER BY c_custkey, n_name
    """,
)
def join_nullsafe(spark, sf_dir):
    """Null-safe equality join — reference rewrites IS NOT DISTINCT FROM
    (BatchJoinProcessing.cpp:180, null_equality :75-79); Spark: eqNullSafe."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    c = F.nullif(customer.c_nationkey, F.lit(3))
    n = F.nullif(nation.n_nationkey, F.lit(3))
    return (
        customer.join(nation, c.eqNullSafe(n))
        .select("c_custkey", "n_name")
        .orderBy("c_custkey", "n_name")
    )


# Non-equi condition alongside equi keys: the reference splits this into
# equi-join + post-filter (split_inequality_join_into_join_and_filter,
# BatchJoinProcessing.cpp:148-250); Catalyst's ExtractEquiJoinKeys does the
# same automatically.
twin(
    "join_nonequi",
    """
    SELECT o_orderkey, l_linenumber, l_extendedprice
    FROM orders JOIN lineitem
      ON o_orderkey = l_orderkey
     AND l_extendedprice > o_totalprice * 0.5
    ORDER BY o_orderkey, l_linenumber
    """,
    tables=("orders", "lineitem"),
)

# Pure-inequality (theta) join: REJECTED by the reference ("Join condition is
# currently not supported", BatchJoinProcessing.cpp:238-244). Spark runs it
# via BroadcastNestedLoopJoin — a capability superset.
twin(
    "join_theta",
    """
    SELECT r1.r_regionkey AS a, r2.r_regionkey AS b
    FROM region r1 JOIN region r2 ON r1.r_regionkey < r2.r_regionkey
    ORDER BY a, b
    """,
    tables=("region",),
)

# ------------------------------------------------------------- subqueries
# Catalyst decorrelates these into semi/anti/scalar joins — the Spark-first
# counterpart of the reference's Calcite HepPlanner subquery rewrites
# (SURVEY §4.1); EXISTS/IN become the same semi/anti kernels the join suite
# exercises directly.

twin(
    "subquery_in",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    ORDER BY o_orderkey
    """,
    tables=("orders", "customer"),
)

twin(
    "subquery_not_in",
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 0 AND c_custkey IS NOT NULL
    )
    ORDER BY o_orderkey
    """,
    tables=("orders", "customer"),
)

twin(
    "subquery_exists",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    ORDER BY c_custkey
    """,
    tables=("customer", "orders"),
)

# The inner filter keeps the difference non-empty at every SF (unfiltered
# NOT EXISTS was vacuous: every fixture customer has an order).
twin(
    "subquery_not_exists",
    """
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000
    )
    ORDER BY c_custkey
    """,
    tables=("customer", "orders"),
)

# 1.2× (not 2×) so rows survive at every SF: the fixture's price
# distribution tops out under 2× the mean, which made the row vacuous.
twin(
    "subquery_scalar",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.2 * (SELECT AVG(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
    tables=("orders",),
)

twin(
    "subquery_correlated_scalar",
    """
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem l
    WHERE l_partkey < 200
      AND l_quantity > 1.9 * (
        SELECT AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
    ORDER BY l_orderkey, l_partkey, l_quantity
    """,
    tables=("lineitem",),
)

# ----------------------------------------------------------- aggregations

twin(
    "agg_no_groupby",
    """
    SELECT ROUND(SUM(l_quantity), 2)       AS sum_qty,
           ROUND(ROUND(SUM(l_extendedprice), 2) / COUNT(l_extendedprice), 6) AS avg_price,
           ROUND(MIN(l_discount), 2)       AS min_disc,
           ROUND(MAX(l_tax), 2)            AS max_tax,
           COUNT(*)                        AS n_rows
    FROM lineitem
    """,
    tables=("lineitem",),
)

twin(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS distinct_supp,
           COUNT(DISTINCT l_partkey) AS distinct_part,
           COUNT(l_orderkey)         AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)

twin(
    "agg_distinct_rows",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    tables=("lineitem",),
)

# $SUM0 (Calcite's sum-or-zero) — SURVEY §2.3; spelled COALESCE(SUM(..), 0).
twin(
    "agg_sum0",
    """
    SELECT o_orderstatus,
           COALESCE(SUM(CASE WHEN o_totalprice > 1e12 THEN o_totalprice END), 0) AS sum0,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tables=("orders",),
)

# Multi-column COUNT(a, b) (CHANGELOG #1553) — counts rows where both non-null.
twin(
    "agg_multicol_count",
    """
    SELECT o_orderstatus,
           COUNT(CASE WHEN o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
                      THEN 1 END) AS n_pairs
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tables=("orders",),
)

# STDDEV/VAR — absent in the reference (SURVEY §2.3), Spark superset.
twin(
    "agg_stats",
    """
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 4)    AS var_qty,
           ROUND(STDDEV_POP(l_quantity), 4)  AS stdp_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)

# ROLLUP/CUBE/GROUPING SETS — absent in the reference, Spark superset.
# NULLS FIRST is explicit: Spark ASC defaults NULLS FIRST, DuckDB NULLS LAST.
twin(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tables=("lineitem",),
)

twin(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tables=("lineitem",),
)

twin(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tables=("lineitem",),
)

# Exact median — interpolating percentile; both engines compute (lo+hi)/2.
pair(
    "agg_median",
    """
    SELECT l_returnflag, ROUND(PERCENTILE(l_extendedprice, 0.5), 4) AS median_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    oracle="""
    SELECT l_returnflag, ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS median_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS exact_parts,
           TRUE AS orders_within_10pct,
           TRUE AS parts_within_10pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """HyperLogLog++ approximate distinct — beyond-reference scale op. The
    sketch estimate is engine-specific, so the checkable output is the exact
    count plus a thresholded |approx-exact| <= 10% boolean (HLL++ default
    rsd=5%; 10% is a 2-sigma bound); the oracle asserts the exact counts and
    literal TRUE."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= F.col("exact_orders") * 0.10
        ).alias("orders_within_10pct"),
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.col("exact_parts") * 0.10
        ).alias("parts_within_10pct"),
    ).orderBy("l_returnflag")


@register(
    "sketch_hll_mergeable",
    oracle="""
    SELECT CAST(COUNT(DISTINCT DATE_TRUNC('month', o_orderdate)) AS BIGINT)
               AS n_partitions,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS merged_within_10pct
    FROM orders
    """,
)
def sketch_hll_mergeable(spark, sf_dir):
    """Mergeable-sketch rollup: per-month HLL sketches of o_custkey
    (Datasketches binary via hll_sketch_agg) UNIONED into one estimate
    with hll_union_agg — the pre-aggregated-sketch pattern that answers
    'distinct users over any date range' at 100 TB without rescanning
    raw data: store one tiny sketch per partition, merge at query time.
    Sketch building is order-independent (per-bucket max of hashed
    values), so the estimate is deterministic; it is still
    engine-specific, so the checkable output is the exact global count
    plus a thresholded |merged-exact| <= 10% boolean (same discipline as
    agg_approx_distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    sketches = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("g")
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    merged = sketches.agg(
        F.count("*").cast("long").alias("n_partitions"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    exact = orders.agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_custs")
    )
    return merged.crossJoin(exact).select(
        "n_partitions",
        "exact_custs",
        (
            F.abs(F.col("merged_est") - F.col("exact_custs"))
            <= F.col("exact_custs") * 0.10
        ).alias("merged_within_10pct"),
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50_exact,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_exact,
           TRUE AS p50_within_1pct,
           TRUE AS p90_within_1pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_percentile(spark, sf_dir):
    """Approximate percentile (Greenwald-Khanna sketch, percentile_approx)
    — the single-pass, mergeable, bounded-memory quantile for 100 TB where
    the exact interpolating PERCENTILE needs a per-group sort. Sketch
    estimates are engine-specific, so the checkable output is the exact
    quantile plus a thresholded |approx-exact| <= 1% boolean (accuracy
    10000 => rank error 1e-4, far inside the threshold); the oracle
    asserts the exact values and literal TRUE."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("e90"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("a50"),
        F.expr("percentile_approx(l_extendedprice, 0.9, 10000)").alias("a90"),
    )
    return agg.select(
        "l_returnflag",
        F.round("e50", 4).alias("p50_exact"),
        F.round("e90", 4).alias("p90_exact"),
        (F.abs(F.col("a50") - F.col("e50")) <= F.abs(F.col("e50")) * 0.01).alias("p50_within_1pct"),
        (F.abs(F.col("a90") - F.col("e90")) <= F.abs(F.col("e90")) * 0.01).alias("p90_within_1pct"),
    ).orderBy("l_returnflag")


# ------------------------------------------------------------- windows

twin(
    "window_row_number",
    """
    SELECT * FROM (
        SELECT o_orderkey, o_custkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) t WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tables=("orders",),
)

twin(
    "window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tables=("orders",),
    headline=True,
)

twin(
    "window_lag_lead",
    """
    SELECT user_id, event_id,
           LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev2_type
    FROM events
    ORDER BY user_id, event_id
    """,
    tables=("events",),
)

twin(
    "window_first_last",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey) AS first_price,
           LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tables=("orders",),
)

# Bounded ROWS frame — the reference's Overlap kernels territory (SURVEY §2.1
# OverlapGenerator/Accumulator); Spark handles frames natively.
twin(
    "window_moving_avg",
    """
    SELECT user_id, event_id,
           ROUND(ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2)
                 / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mov_avg,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 2) AS win3_sum
    FROM events
    ORDER BY user_id, event_id
    """,
    tables=("events",),
)

# RANK/DENSE_RANK/NTILE/PERCENT_RANK/CUME_DIST — rejected by the reference
# ("cudf aggs no supported currently", windowFunctionSuite.yaml:19); superset.
twin(
    "window_rank",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           RANK()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity)   AS rnk,
           DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)   AS drnk,
           NTILE(4)     OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS prank,
           ROUND(CUME_DIST()    OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS cdist
    FROM lineitem
    WHERE l_orderkey < 200
    ORDER BY l_returnflag, l_orderkey, l_linenumber
    """,
    tables=("lineitem",),
)

# Window without PARTITION BY — reference needs special overlap machinery
# (BatchWindowFunctionProcessing.h:82-89, OverlapGenerator/Accumulator
# kernels); naive Spark computes it in ONE partition. This uses the
# distributed two-pass chunked prefix aggregate (operators.window
# .global_running): range-partition on the ordering keys, per-chunk running
# partials, broadcast per-chunk offsets. Values are summed as exact integer
# cents — chunked summation reassociates floating addition, so doubles
# would not be bit-deterministic across engines.
@register(
    "window_global",
    oracle="""
    SELECT event_id,
           ROW_NUMBER() OVER (ORDER BY ts, event_id) AS seq,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))
                OVER (ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
               AS running_total
    FROM events
    ORDER BY event_id
    """,
)
def window_global(spark, sf_dir):
    """Global running sum + row number with NO single-partition pass."""
    from blazingsql_spark.operators.window import global_running

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.floor(F.col("value") * 100).cast("long").alias("__cents")
    )
    out = global_running(
        ev,
        order_by=["ts", "event_id"],
        sum_cols={"__run_cents": "__cents"},
        row_number_as="seq",
    )
    return out.select(
        "event_id",
        "seq",
        (F.col("__run_cents").cast("double") / 100).alias("running_total"),
    ).orderBy("event_id")

# Multiple distinct OVER clauses in one SELECT — rejected by the reference
# (PhysicalPlanGenerator.h:300-302); Spark superset.
twin(
    "window_multi_over",
    """
    SELECT o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn_cust,
           ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn_status,
           ROUND(ROUND(SUM(o_totalprice) OVER (PARTITION BY o_orderpriority), 2)
                 / COUNT(o_totalprice) OVER (PARTITION BY o_orderpriority), 6) AS avg_prio_price
    FROM orders
    ORDER BY o_orderkey
    """,
    tables=("orders",),
)

# RANGE frame over a numeric ordering — rejected by the reference
# (PhysicalPlanGenerator.h:304-306); Spark superset. Headline so the lifted
# capability carries a bench number (VERDICT r2 item 5).
twin(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_similar
    FROM orders
    ORDER BY o_orderkey
    """,
    tables=("orders",),
    headline=True,
)

# Time-based RANGE frame over event-time — the streaming-adjacent form of
# the same lifted capability: per-user trailing-hour rollup. The summed
# value rides an exact integer cent grid (FLOOR inside SUM) so the window
# sum is order-independent across engines.
twin(
    "window_range_time",
    """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100
               AS v_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tables=("events",),
    headline=True,
)

# ------------------------------------------------------- sorts / limits

twin(
    "topk",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tables=("orders",),
    doc="ORDER BY + LIMIT → Spark TakeOrderedAndProject (true top-k; the "
    "reference sorts fully then limits, SURVEY §2.5)",
)

twin(
    "limit_only",
    """
    SELECT COUNT(*) AS n FROM (SELECT * FROM lineitem LIMIT 100) t
    """,
    tables=("lineitem",),
    doc="LIMIT without ORDER BY (row content nondeterministic, count stable)",
)

twin(
    "orderby_nulls",
    """
    SELECT ln, COUNT(*) AS n
    FROM (SELECT NULLIF(l_linenumber, 3) AS ln FROM lineitem) t
    GROUP BY ln
    ORDER BY ln DESC NULLS LAST
    """,
    tables=("lineitem",),
    doc="NULLS FIRST/LAST ordering (reference OrderBy.cpp:133-175; Spark "
    "DESC default is NULLS LAST, DuckDB NULLS FIRST — explicit in both)",
)

# ------------------------------------------------------------- set ops

twin(
    "union_all",
    """
    SELECT nationkey, src FROM (
        SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    ) t
    ORDER BY nationkey, src
    """,
    tables=("customer", "supplier"),
)

twin(
    "union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    tables=("customer", "supplier"),
)

# INTERSECT / EXCEPT — absent in the reference (SURVEY §2.6); superset.
twin(
    "intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    tables=("customer", "supplier"),
)

# Genuine EXCEPT ALL over duplicate-bearing inputs: customers outnumber
# suppliers per nation at every SF, so per-key multiplicities (not just set
# membership) decide the output — count(c_nationkey=k) - count(s_nationkey=k)
# copies of k survive. The pre-r11 form was plain EXCEPT over two always-
# identical key sets (vacuously empty; VERDICT r10 "What's wrong" #1).
twin(
    "except_all",
    """
    SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) t
    ORDER BY nationkey
    """,
    tables=("customer", "supplier"),
)

# --------------------------------------------------- events / time ops

# Batch form of the streaming tumbling-window aggregate; the streaming twin
# lives in blazingsql_spark.streaming. Spark window(ts, ...).start ==
# DuckDB time_bucket — both are epoch-aligned.
pair(
    "events_tumbling_window",
    """
    SELECT window_start, event_type, n, v FROM (
        SELECT window(ts, '5 minutes').start AS window_start, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        FROM events GROUP BY window(ts, '5 minutes'), event_type
    ) t
    ORDER BY window_start, event_type
    """,
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS v
    FROM events GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    tables=("events",),
    doc="tumbling event-time window (batch twin of the streaming pipeline)",
)

twin(
    "events_sessionize",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           ROUND(SUM(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tables=("events",),
    headline=True,
    doc="sessionization via lag+gap+cumsum — beyond-reference streaming-ish op",
)

pair(
    "events_json_extract",
    """
    SELECT event_id, CAST(get_json_object(props, '$.k') AS INT) AS k
    FROM events
    ORDER BY event_id
    """,
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    ORDER BY event_id
    """,
    tables=("events",),
    doc="JSON scalar extraction — absent in reference (JSON is file-format only, SURVEY §2.7)",
)

# Pivot — absent in the reference; Spark-native superset op.
twin(
    "pivot_status",
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)


# ------------------------------------------- custom operators (superset)
# The reference rejects/lacks these entirely (SURVEY §2.2: "No range/as-of/
# interval join operators"); implemented in blazingsql_spark.operators.


@register(
    "asof_join_events",
    headline=True,
    oracle="""
    SELECT p.event_id, p.user_id, ROUND(v.value, 2) AS last_view_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
    """,
)
def asof_join_events(spark, sf_dir):
    """As-of join (operators.asof.asof_join): for each purchase, the user's
    most recent prior 'view' value — union+carry-forward, one shuffle, no
    Python. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from blazingsql_spark.operators import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    out = asof_join(purchases, views, on="ts", by=["user_id"], right_value_cols=["view_value"])
    return out.select(
        "event_id", "user_id", F.round("view_value", 2).alias("last_view_value")
    ).orderBy("event_id")


@register(
    "asof_forward_events",
    oracle="""
    SELECT p.event_id, p.user_id, ROUND(v.value, 2) AS next_view_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts <= v.ts
    ORDER BY p.event_id
    """,
)
def asof_forward_events(spark, sf_dir):
    """Forward as-of join (operators.asof.asof_join direction='forward'):
    for each purchase, the user's EARLIEST view at-or-after it — the same
    union+carry scan run descending. Oracle: DuckDB ASOF with the
    inequality flipped (p.ts <= v.ts picks the minimum matching v.ts)."""
    from blazingsql_spark.operators import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases, views, on="ts", by=["user_id"],
        right_value_cols=["view_value"], direction="forward",
    )
    return out.select(
        "event_id", "user_id", F.round("view_value", 2).alias("next_view_value")
    ).orderBy("event_id")


@register(
    "asof_nearest_events",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view'),
    b AS (SELECT p.event_id, MAX(v.ts) AS ts FROM p JOIN v ON p.user_id = v.user_id
          WHERE v.ts <= p.ts GROUP BY p.event_id),
    f AS (SELECT p.event_id, MIN(v.ts) AS ts FROM p JOIN v ON p.user_id = v.user_id
          WHERE v.ts >= p.ts GROUP BY p.event_id),
    pick AS (
        SELECT p.event_id, p.user_id,
               CASE WHEN b.ts IS NULL THEN f.ts
                    WHEN f.ts IS NULL THEN b.ts
                    -- exact ties resolve backward (b.ts)
                    WHEN f.ts - p.ts < p.ts - b.ts THEN f.ts
                    ELSE b.ts END AS ts
        FROM p LEFT JOIN b ON p.event_id = b.event_id
               LEFT JOIN f ON p.event_id = f.event_id
    )
    SELECT pick.event_id, pick.user_id, ROUND(v.value, 2) AS near_view_value
    FROM pick LEFT JOIN v ON pick.user_id = v.user_id AND pick.ts = v.ts
    ORDER BY pick.event_id
    """,
)
def asof_nearest_events(spark, sf_dir):
    """Nearest as-of join (operators.asof.asof_join direction='nearest'):
    for each purchase, the user's CLOSEST view in time either side (exact
    ties resolve backward) — pandas merge_asof 'nearest' semantics at
    shuffle scale: both directional scans share one exchange, then a
    per-row pick. Oracle: explicit MAX-before/MIN-after compare (no ts
    duplicates per user in the fixtures, verified at all three SFs)."""
    from blazingsql_spark.operators import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases, views, on="ts", by=["user_id"],
        right_value_cols=["view_value"], direction="nearest",
    )
    return out.select(
        "event_id", "user_id", F.round("view_value", 2).alias("near_view_value")
    ).orderBy("event_id")


@register(
    "range_join_orders",
    oracle="""
    SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b,
           ROUND(ABS(a.o_totalprice - b.o_totalprice), 2) AS price_gap
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND ABS(a.o_totalprice - b.o_totalprice) <= 100
    ORDER BY key_a, key_b
    """,
)
def range_join_orders(spark, sf_dir):
    """Range join (operators.asof.range_join): same-customer order pairs
    within $100 of each other — bucketized equi-join (3x fan-out), never a
    nested-loop join."""
    from blazingsql_spark.operators import range_join

    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(
        "o_custkey", F.col("o_orderkey").alias("key_a"), F.col("o_totalprice").alias("price_a")
    )
    b = orders.select(
        "o_custkey", F.col("o_orderkey").alias("key_b"), F.col("o_totalprice").alias("price_b")
    )
    out = range_join(a, b, "price_a", "price_b", 100.0, by=["o_custkey"])
    return (
        out.filter(F.col("key_a") < F.col("key_b"))
        .select(
            "key_a",
            "key_b",
            F.round(F.abs(F.col("price_a") - F.col("price_b")), 2).alias("price_gap"),
        )
        .orderBy("key_a", "key_b")
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) t WHERE rnk <= 3
    ORDER BY c_mktsegment, rnk
    """,
)
def topk_per_group(spark, sf_dir):
    """Top-K per group (operators.topk): WindowGroupLimit pushes the rank
    bound into the per-partition sort — each task keeps K rows per group."""
    from blazingsql_spark.operators import top_k_per_group

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    out = top_k_per_group(
        joined,
        ["c_mktsegment"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
        rank_col="rnk",
    )
    return out.orderBy("c_mktsegment", "rnk")


# NTH_VALUE — the reference's NTH_ELEMENT aggregate kind (GroupBy.h:15-28).
twin(
    "window_nth_value",
    """
    SELECT o_custkey, o_orderkey,
           NTH_VALUE(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_price
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tables=("orders",),
)

# UNION with type coercion — unifyTablesSuite.yaml (int widened to bigint).
twin(
    "union_type_coerce",
    """
    SELECT v FROM (
        SELECT CAST(l_linenumber AS INT) AS v FROM lineitem WHERE l_orderkey < 50
        UNION ALL
        SELECT o_orderkey AS v FROM orders WHERE o_orderkey < 50
    ) t
    ORDER BY v
    """,
    tables=("lineitem", "orders"),
)


# Null semantics under aggregation/grouping — the reference runs every suite
# twice (tpch/ and tpch-with-nulls/, createSchema.py:174-176); testdata has
# no nulls, so inject them with NULLIF and exercise null keys + null skips.
twin(
    "agg_with_nulls",
    """
    SELECT grp,
           COUNT(*) AS n_all,
           COUNT(val) AS n_valid,
           ROUND(COALESCE(SUM(val), 0), 2) AS sum_val,
           ROUND(COALESCE(ROUND(SUM(val), 2) / NULLIF(COUNT(val), 0), -1), 6) AS avg_val,
           MIN(val) AS min_val
    FROM (
        SELECT NULLIF(l_returnflag, 'N') AS grp,
               CASE WHEN l_linenumber <> 3 THEN l_quantity END AS val
        FROM lineitem
    ) t
    GROUP BY grp
    ORDER BY grp NULLS FIRST
    """,
    tables=("lineitem",),
    doc="null group keys + null-skipping aggregates (with-nulls suite dimension)",
)

# DISTINCT over injected nulls (null == null for DISTINCT purposes).
twin(
    "distinct_with_nulls",
    """
    SELECT DISTINCT NULLIF(l_linenumber, 2) AS ln, NULLIF(l_linestatus, 'O') AS st
    FROM lineitem
    ORDER BY ln NULLS FIRST, st NULLS FIRST
    """,
    tables=("lineitem",),
)

# Joins dropping null keys (standard SQL semantics the reference implements
# explicitly by pre-filtering, BatchJoinProcessing.cpp:412-427).
twin(
    "join_null_keys_dropped",
    """
    SELECT COUNT(*) AS n_joined,
           CAST(SUM(CASE WHEN nk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_rows_joined
    FROM (SELECT NULLIF(c_nationkey, 3) AS nk FROM customer) c
    JOIN nation ON c.nk = n_nationkey
    """,
    tables=("customer", "nation"),
)


# ---------------------------------------------------- round-3 SQL surface

# OFFSET pagination (reference LogicalLimit carries no offset — superset).
twin(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    tables=("orders",),
)

# HAVING over grouped aggregates.
twin(
    "agg_having",
    """
    SELECT l_suppkey, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 25
    ORDER BY l_suppkey
    """,
    tables=("lineitem",),
)

# Interpolated / discrete percentiles (ordered-set aggregates; the exact
# complement of agg_approx_percentile's sketch path).
twin(
    "agg_percentile_cont",
    """
    SELECT l_returnflag,
           ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity), 6)
               AS p50_qty,
           ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 6)
               AS p90_price,
           ROUND(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY l_quantity), 6)
               AS p25_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)


# Aggregate FILTER clause (per-aggregate predicates, one pass).
twin(
    "agg_filter_clause",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_discount > 0.05)            AS n_disc,
           ROUND(SUM(l_quantity) FILTER (WHERE l_tax > 0.03), 2) AS qty_taxed,
           COUNT(*)                                              AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)

# IGNORE NULLS window carry-forward (gap filling) — dialect-divergent
# placement: Spark puts IGNORE NULLS after the call, DuckDB inside it.
pair(
    "window_ignore_nulls",
    """
    SELECT o_orderkey, o_custkey,
           LAST_VALUE(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END)
               IGNORE NULLS
               OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_f_order
    FROM orders
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey, o_custkey,
           LAST_VALUE(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END
                      IGNORE NULLS)
               OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_f_order
    FROM orders
    ORDER BY o_orderkey
    """,
    tables=("orders",),
)


@register(
    "agg_salted_skew",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_v
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_salted_skew(spark, sf_dir):
    """Salted two-phase aggregation (operators.skew.salted_agg): the
    hot-key remedy when one grouping key exceeds an executor — phase 1
    spreads each key over 16 salted reducers, phase 2 merges the partials.
    Result is bit-equal to the plain GROUP BY (the oracle)."""
    from blazingsql_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "v_cents", F.floor(F.col("value") * 100).cast("long")
    )
    out = salted_agg(ev, ["event_type"], sum_cols={"total_cents": "v_cents"}, count_as="n")
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("total_cents").cast("double") / 100).alias("total_v"),
    ).orderBy("event_type")


# Correlation / covariance aggregates (superset — reference has none).
twin(
    "agg_corr_covar",
    """
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 6)       AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 6)      AS covs_qty_disc,
           ROUND(COVAR_POP(l_quantity, l_discount), 6)       AS covp_qty_disc,
           ROUND(STDDEV_SAMP(l_extendedprice), 4)            AS sd_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)

# Linear-regression aggregates.
twin(
    "agg_regression",
    """
    SELECT o_orderstatus,
           ROUND(REGR_SLOPE(o_totalprice, o_custkey), 6)     AS slope,
           ROUND(REGR_INTERCEPT(o_totalprice, o_custkey), 4) AS icept,
           ROUND(REGR_R2(o_totalprice, o_custkey), 6)        AS r2,
           CAST(REGR_COUNT(o_totalprice, o_custkey) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tables=("orders",),
)


# Ordered-funnel analysis (complex-event processing, batch form): users who
# viewed, then clicked AFTER the view, then purchased AFTER the click.
twin(
    "events_funnel",
    """
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_after_click
    """,
    tables=("events",),
)

# Cohort retention: users grouped by first-seen day, distinct-active counts
# per subsequent week. Dialect-divergent DATEDIFF argument order.
pair(
    "events_retention",
    """
    WITH f AS (
        SELECT user_id, DATE_TRUNC('day', MIN(ts)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, DATE_TRUNC('day', ts) AS day FROM events)
    SELECT f.cohort_day,
           CAST(FLOOR(DATEDIFF(act.day, f.cohort_day) / 7) AS BIGINT) AS week_n,
           CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS active_users
    FROM f JOIN act ON f.user_id = act.user_id
    GROUP BY f.cohort_day, week_n
    ORDER BY f.cohort_day, week_n
    """,
    oracle="""
    WITH f AS (
        SELECT user_id, DATE_TRUNC('day', MIN(ts)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    act AS (SELECT DISTINCT user_id, DATE_TRUNC('day', ts) AS day FROM events)
    SELECT f.cohort_day,
           CAST(FLOOR(DATEDIFF('day', f.cohort_day, act.day) / 7) AS BIGINT) AS week_n,
           CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS active_users
    FROM f JOIN act ON f.user_id = act.user_id
    GROUP BY f.cohort_day, week_n
    ORDER BY f.cohort_day, week_n
    """,
    tables=("events",),
)

# Ratio-to-report: each line's share of its order total, on the exact cent
# grid so the window sum is order-independent across engines.
twin(
    "window_ratio_to_report",
    """
    SELECT l_orderkey, l_linenumber,
           FLOOR(CAST(FLOOR(l_extendedprice * 100) AS BIGINT) * 1e6 /
                 SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                     OVER (PARTITION BY l_orderkey)) / 1000000 AS price_share
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    tables=("lineitem",),
)


# GROUPING() indicator over ROLLUP (distinguishes "NULL because subtotal"
# from "NULL because data").
twin(
    "agg_grouping_fn",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT)  AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT)  AS g_ls,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
    """,
    tables=("lineitem",),
)

# Remaining set-op spellings (complement of intersect / except_all).
twin(
    "intersect_all",
    """
    SELECT l_suppkey FROM lineitem WHERE l_orderkey < 500
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 25
    ORDER BY l_suppkey
    """,
    tables=("lineitem",),
)

# Sides restricted asymmetrically so the set difference is non-empty
# (nationkeys 10..19 survive) — both unrestricted sides cover all 25
# nations at every SF, which made the row vacuous.
twin(
    "except_distinct",
    """
    SELECT c_nationkey FROM customer WHERE c_nationkey < 20
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_nationkey < 10
    ORDER BY c_nationkey
    """,
    tables=("customer", "supplier"),
)


# Calendar gap-filling: zero-fill days with no events per type (the dense
# calendar join analytics needs before charting/anomaly detection).
# Dialect-divergent series generation (Spark sequence+explode vs DuckDB
# generate_series is shared, but the UNNEST spelling differs).
pair(
    "events_gapfill",
    """
    WITH bounds AS (
        SELECT DATE_TRUNC('day', MIN(ts)) AS d0, DATE_TRUNC('day', MAX(ts)) AS d1
        FROM events
    ),
    cal AS (
        SELECT EXPLODE(SEQUENCE(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        SELECT DATE_TRUNC('day', ts) AS day, event_type, COUNT(*) AS n
        FROM events GROUP BY day, event_type
    )
    SELECT c.day, t.event_type,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n
    FROM cal c CROSS JOIN types t
    LEFT JOIN actual a ON a.day = c.day AND a.event_type = t.event_type
    ORDER BY c.day, t.event_type
    """,
    oracle="""
    WITH bounds AS (
        SELECT DATE_TRUNC('day', MIN(ts)) AS d0, DATE_TRUNC('day', MAX(ts)) AS d1
        FROM events
    ),
    cal AS (
        SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        SELECT DATE_TRUNC('day', ts) AS day, event_type, COUNT(*) AS n
        FROM events GROUP BY day, event_type
    )
    SELECT c.day, t.event_type,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n
    FROM cal c CROSS JOIN types t
    LEFT JOIN actual a ON a.day = c.day AND a.event_type = t.event_type
    ORDER BY c.day, t.event_type
    """,
    tables=("events",),
)

# Trailing-window anomaly score: each day's count vs the mean/stddev of the
# preceding 7 days (per event type). Counts are integers, so mean/std ride
# exact integer sums; the z-score gets the FLOOR grid.
twin(
    "events_anomaly",
    """
    WITH daily AS (
        SELECT DATE_TRUNC('day', ts) AS day, event_type, COUNT(*) AS n
        FROM events GROUP BY day, event_type
    )
    SELECT day, event_type, CAST(n AS BIGINT) AS n,
           FLOOR(
               (n - AVG(n) OVER w) /
               GREATEST(STDDEV_SAMP(n) OVER w, 0.001) * 1000
           ) / 1000 AS z_score
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ORDER BY day, event_type
    """,
    tables=("events",),
)


# Exponentially-weighted moving average over a trailing event-time window
# (the smoothing metric ops dashboards run next to events_anomaly's
# z-scores). Weights are powers of 0.5 and counts are small integers, so
# every product and partial sum is exactly representable — the dot product
# is bit-identical across engines regardless of summation order. Spark
# spells the dot product zip_with+aggregate; DuckDB list_dot_product.
pair(
    "events_ewma",
    """
    WITH daily AS (
        SELECT DATE_TRUNC('day', ts) AS day, event_type, COUNT(*) AS n
        FROM events GROUP BY day, event_type
    ),
    win AS (
        SELECT day, event_type, n,
               collect_list(n) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS arr
        FROM daily
    )
    SELECT day, event_type, CAST(n AS BIGINT) AS n,
           FLOOR(
             aggregate(zip_with(arr, sequence(size(arr) - 1, 0, -1),
                                (x, e) -> x * power(0.5, e)),
                       CAST(0 AS DOUBLE), (acc, v) -> acc + v)
             / (2 * (1 - power(0.5, size(arr)))) * 1000000) / 1000000 AS ewma
    FROM win ORDER BY event_type, day
    """,
    oracle="""
    WITH daily AS (
        SELECT DATE_TRUNC('day', ts) AS day, event_type, COUNT(*) AS n
        FROM events GROUP BY day, event_type
    ),
    win AS (
        SELECT day, event_type, n,
               list(n) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS arr
        FROM daily
    )
    SELECT day, event_type, CAST(n AS BIGINT) AS n,
           FLOOR(
             list_dot_product(
                 list_transform(arr, x -> CAST(x AS DOUBLE)),
                 list_transform(generate_series(1, len(arr)),
                                i -> POWER(0.5, len(arr) - i)))
             / (2 * (1 - POWER(0.5, len(arr)))) * 1000000) / 1000000 AS ewma
    FROM win ORDER BY event_type, day
    """,
    tables=("events",),
)


# Edit-distance expressions (fuzzy matching, the data-cleaning surface) —
# LEVENSHTEIN has the same definition in both engines.
twin(
    "expr_levenshtein",
    """
    SELECT c_custkey,
           LEVENSHTEIN(c_name, 'Customer#000000001')        AS d_ref,
           LEVENSHTEIN(LOWER(c_mktsegment), 'building')     AS d_seg,
           LEVENSHTEIN(c_name, c_name)                      AS d_self
    FROM customer
    WHERE c_custkey < 200
    ORDER BY c_custkey
    """,
    tables=("customer",),
)

# Per-window approximate distinct users (HLL++ under event-time tumbling
# windows — the streaming-dashboard cardinality shape). Same thresholded
# pattern as agg_approx_distinct: the sketch estimate is engine-specific,
# so the gate is exact count + |approx-exact| <= 10% boolean.
pair(
    "events_window_approx_distinct",
    """
    SELECT DATE_TRUNC('day', ts) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           (ABS(APPROX_COUNT_DISTINCT(user_id) - COUNT(DISTINCT user_id))
              <= 0.1 * COUNT(DISTINCT user_id)) AS within_10pct
    FROM events
    GROUP BY day
    ORDER BY day
    """,
    oracle="""
    SELECT DATE_TRUNC('day', ts) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_10pct
    FROM events
    GROUP BY day
    ORDER BY day
    """,
    tables=("events",),
)


@register(
    "join_fuzzy_names",
    oracle="""
    WITH probes AS (
        SELECT c_custkey AS probe_key,
               CONCAT(SUBSTR(c_name, 1, LENGTH(c_name) - 1), 'X') AS probe_name
        FROM customer WHERE c_custkey % 50 = 0
    )
    SELECT p.probe_key, c.c_custkey, p.probe_name, c.c_name,
           CAST(LEVENSHTEIN(p.probe_name, c.c_name) AS INT) AS edit_distance
    FROM probes p JOIN customer c
      ON LEVENSHTEIN(p.probe_name, c.c_name) <= 1
    ORDER BY p.probe_key, c.c_custkey
    """,
)
def join_fuzzy_names(spark, sf_dir):
    """Fuzzy join (operators.fuzzy.fuzzy_join): probes are customer names
    with the last character mutated; the join recovers every customer
    within one edit via SymSpell-style deletion-neighborhood blocking —
    candidate generation is an equi-join on deletion variants (explode
    factor len+1), exact levenshtein verifies candidates only. The DuckDB
    oracle is the all-pairs levenshtein join (exact semantics, viable at
    test scale) — blocking must lose NOTHING vs all-pairs, which is the
    recall theorem this query asserts."""
    from blazingsql_spark.operators import fuzzy_join

    cust = load_table(spark, sf_dir, "customer")
    probes = cust.filter(F.col("c_custkey") % 50 == 0).select(
        F.col("c_custkey").alias("probe_key"),
        F.concat(
            F.expr("SUBSTR(c_name, 1, LENGTH(c_name) - 1)"), F.lit("X")
        ).alias("probe_name"),
    )
    out = fuzzy_join(
        probes, cust.select("c_custkey", "c_name"), "probe_name", "c_name"
    )
    return out.select(
        "probe_key", "c_custkey", "probe_name", "c_name",
        F.col("edit_distance").cast("int").alias("edit_distance"),
    ).orderBy("probe_key", "c_custkey")


# NTILE bucketing (quartiles per group) — deterministic because the window
# order is a unique total order.
twin(
    "window_ntile",
    """
    SELECT l_orderkey, l_linenumber,
           NTILE(4) OVER (PARTITION BY l_returnflag
                          ORDER BY l_orderkey, l_linenumber) AS quartile
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    tables=("lineitem",),
)

# Native SQL PIVOT syntax (relational spelling of pivot_status's CASE form).
pair(
    "pivot_native",
    """
    SELECT * FROM (
        SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem
    )
    PIVOT (ROUND(SUM(l_quantity), 2) FOR l_linestatus IN ('O' AS qty_o, 'F' AS qty_f))
    ORDER BY l_returnflag
    """,
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)


# Linear interpolation of gaps in a daily time series (the step after
# events_gapfill's zero-fill when the metric is a LEVEL, not a count):
# missing (day, type) cells get prev + (next-prev) * elapsed/gap. Daily
# values ride an exact integer cent grid and day distances are integers,
# so both engines divide identical operands — deterministic, plus a FLOOR
# grid on the output. Carried prev/next are (day, value) STRUCTS through
# IGNORE NULLS windows, so a value always travels with its own day (the
# same single-struct discipline as asof_join).
pair(
    "events_interpolate",
    """
    WITH bounds AS (
        SELECT DATE_TRUNC('day', MIN(ts)) AS d0, DATE_TRUNC('day', MAX(ts)) AS d1
        FROM events
    ),
    cal AS (SELECT EXPLODE(SEQUENCE(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        -- every third calendar day is withheld: the fixture grid is dense,
        -- so the gaps the operator exists for are planted deterministically
        SELECT DATE_TRUNC('day', ts) AS day, event_type,
               SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS v
        FROM events
        WHERE EXTRACT(DAY FROM ts) % 3 <> 0
        GROUP BY day, event_type
    ),
    grid AS (
        SELECT c.day, t.event_type, a.v
        FROM cal c CROSS JOIN types t
        LEFT JOIN actual a ON a.day = c.day AND a.event_type = t.event_type
    ),
    marked AS (
        SELECT day, event_type, v,
               LAST_VALUE(CASE WHEN v IS NOT NULL
                               THEN NAMED_STRUCT('d', day, 'val', v) END)
                   IGNORE NULLS
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
               FIRST_VALUE(CASE WHEN v IS NOT NULL
                                THEN NAMED_STRUCT('d', day, 'val', v) END)
                   IGNORE NULLS
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        FROM grid
    )
    SELECT day, event_type, (v IS NULL) AS interpolated,
           FLOOR(CASE
               WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
               WHEN p.d IS NULL THEN CAST(nx.val AS DOUBLE)
               WHEN nx.d IS NULL THEN CAST(p.val AS DOUBLE)
               ELSE p.val + (nx.val - p.val)
                    * DATEDIFF(day, p.d) / DATEDIFF(nx.d, p.d)
           END * 1000) / 1000 AS v_interp
    FROM marked
    ORDER BY event_type, day
    """,
    oracle="""
    WITH bounds AS (
        SELECT DATE_TRUNC('day', MIN(ts)) AS d0, DATE_TRUNC('day', MAX(ts)) AS d1
        FROM events
    ),
    cal AS (
        SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    actual AS (
        -- every third calendar day is withheld: the fixture grid is dense,
        -- so the gaps the operator exists for are planted deterministically
        SELECT DATE_TRUNC('day', ts) AS day, event_type,
               SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS v
        FROM events
        WHERE EXTRACT(DAY FROM ts) % 3 <> 0
        GROUP BY day, event_type
    ),
    grid AS (
        SELECT c.day, t.event_type, a.v
        FROM cal c CROSS JOIN types t
        LEFT JOIN actual a ON a.day = c.day AND a.event_type = t.event_type
    ),
    marked AS (
        SELECT day, event_type, v,
               LAST_VALUE(CASE WHEN v IS NOT NULL
                               THEN {'d': day, 'val': v} END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
               FIRST_VALUE(CASE WHEN v IS NOT NULL
                                THEN {'d': day, 'val': v} END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        FROM grid
    )
    SELECT day, event_type, (v IS NULL) AS interpolated,
           FLOOR(CASE
               WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
               WHEN p.d IS NULL THEN CAST(nx.val AS DOUBLE)
               WHEN nx.d IS NULL THEN CAST(p.val AS DOUBLE)
               ELSE p.val + (nx.val - p.val)
                    * DATEDIFF('day', p.d, day) / DATEDIFF('day', p.d, nx.d)
           END * 1000) / 1000 AS v_interp
    FROM marked
    ORDER BY event_type, day
    """,
    tables=("events",),
)


# Ordered string aggregation — LISTAGG ... WITHIN GROUP (SQL:2016; Spark 4
# spelling) vs DuckDB string_agg(... ORDER BY). Ordering by the aggregated
# value itself makes the concatenation total-order deterministic (duplicate
# elements are interchangeable).
pair(
    "agg_string_agg",
    """
    SELECT n.n_regionkey,
           LISTAGG(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations
    FROM nation n
    GROUP BY n.n_regionkey
    ORDER BY n.n_regionkey
    """,
    oracle="""
    SELECT n.n_regionkey,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n
    GROUP BY n.n_regionkey
    ORDER BY n.n_regionkey
    """,
    tables=("nation",),
)

# Boolean and bitwise aggregates (BOOL_AND/BOOL_OR, BIT_AND/BIT_OR/BIT_XOR)
# — same names in both dialects; integer inputs so results are exact.
twin(
    "agg_bool_bit",
    """
    SELECT l_returnflag,
           BOOL_AND(l_quantity > 1)           AS all_gt1,
           BOOL_OR(l_quantity > 49)           AS any_gt49,
           CAST(BIT_AND(l_partkey) AS BIGINT) AS band_part,
           CAST(BIT_OR(l_partkey)  AS BIGINT) AS bor_part,
           CAST(BIT_XOR(l_partkey) AS BIGINT) AS bxor_part
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)

# Higher-moment aggregates. Spark's SKEWNESS/KURTOSIS are POPULATION
# moments (m3/m2^1.5, m4/m2^2 - 3) while DuckDB's builtins apply sample
# corrections — so the oracle computes the same population moments
# explicitly from a two-pass mean join rather than calling DuckDB's
# skewness()/kurtosis().
pair(
    "agg_skew_kurt",
    """
    SELECT l_returnflag,
           ROUND(SKEWNESS(l_quantity), 6) AS skew_qty,
           ROUND(KURTOSIS(l_quantity), 6) AS kurt_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    oracle="""
    WITH mu AS (
        SELECT l_returnflag AS k, AVG(l_quantity) AS m
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND(AVG(POWER(l.l_quantity - mu.m, 3))
                 / POWER(AVG(POWER(l.l_quantity - mu.m, 2)), 1.5), 6) AS skew_qty,
           ROUND(AVG(POWER(l.l_quantity - mu.m, 4))
                 / POWER(AVG(POWER(l.l_quantity - mu.m, 2)), 2) - 3, 6) AS kurt_qty,
           COUNT(*) AS n
    FROM lineitem l JOIN mu ON l.l_returnflag = mu.k
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    tables=("lineitem",),
)

# GROUP BY ALL — infer grouping keys from the non-aggregate select items
# (same inference rule in Spark 3.4+ and DuckDB).
twin(
    "agg_group_by_all",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY l_returnflag, l_linestatus
    """,
    tables=("lineitem",),
)

# Recursive CTE (Spark 4 WITH RECURSIVE; reference/Calcite never supported
# recursion). The recursive seed generates a 1..12 month spine that then
# LEFT JOINs real data — zero-filled months prove the recursion actually
# drove the join, not the data.
twin(
    "sql_recursive_cte",
    """
    WITH RECURSIVE months(m) AS (
        SELECT 1
        UNION ALL
        SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT months.m AS month_n,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)), 0) AS BIGINT)
               AS total_floor
    FROM months
    LEFT JOIN orders ON MONTH(o_orderdate) = months.m
        AND o_orderdate < DATE '1993-01-01'
    GROUP BY months.m
    ORDER BY months.m
    """,
    tables=("orders",),
)


# First-order Markov transition matrix over per-user event sequences: the
# path-analysis primitive (next-event prediction, anomalous-flow detection).
# One window pass for predecessors + one grouped count; the per-source
# normalization is a window over the |event_types|^2-row transition table.
twin(
    "events_markov",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           FLOOR(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type)
                 * 1000000) / 1000000 AS p
    FROM trans
    ORDER BY prev_type, next_type
    """,
    tables=("events",),
)

# LATERAL correlated subquery with ORDER BY + LIMIT — top-N-per-entity as a
# join (the reference's Calcite frontend has no LATERAL at all; Catalyst
# decorrelates the per-row limit into a rank window, so this is top-k per
# group under the hood, not a nested loop).
twin(
    "join_lateral",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) o
    ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
    """,
    tables=("customer", "orders"),
)


# Fixed-width histogram binning via pure arithmetic (FLOOR of the scaled
# value, top bucket clamped) — engine-portable where WIDTH_BUCKET is not
# (DuckDB lacks it), and a map-side-combinable single-shuffle aggregate.
twin(
    "agg_histogram",
    """
    SELECT CAST(LEAST(FLOOR(CAST(o_totalprice AS DOUBLE) / 50000), 11) AS BIGINT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT)      AS n,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tables=("orders",),
)

# A/B experiment readout: deterministic hash-bucket variant assignment
# (same md5-prefix idiom as functions.sampling.hash_bucket, so assignment
# is reproducible across engines AND across reruns — no rand()), then
# per-variant mean/variance of the conversion metric. One scan, one
# aggregate; the z-score is one driver-side formula over these two rows.
pair(
    "events_ab_test",
    """
    WITH assign AS (
        SELECT value,
               PMOD(CAST(CONV(SUBSTRING(MD5(CONCAT('ab:', CAST(user_id AS STRING))),
                                        1, 15), 16, 10) AS BIGINT), 2) AS variant
        FROM events WHERE event_type = 'purchase'
    )
    SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(AVG(value) * 10000) / 10000 AS mean_value,
           FLOOR(VAR_SAMP(value) * 100) / 100 AS var_value
    FROM assign GROUP BY variant ORDER BY variant
    """,
    """
    WITH assign AS (
        SELECT value,
               ('0x' || SUBSTR(MD5('ab:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   % 2 AS variant
        FROM events WHERE event_type = 'purchase'
    )
    SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
           FLOOR(AVG(value) * 10000) / 10000 AS mean_value,
           FLOOR(VAR_SAMP(value) * 100) / 100 AS var_value
    FROM assign GROUP BY variant ORDER BY variant
    """,
    tables=("events",),
)

# Top user journeys: sessionize (lag+gap+cumsum, as events_sessionize),
# then the ordered event-type path per session via LISTAGG WITHIN GROUP
# (DuckDB spells it STRING_AGG ... ORDER BY), then a path leaderboard.
# The path strings are bounded by session length; the leaderboard cut is
# TakeOrderedAndProject.
pair(
    "events_top_paths",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ), paths AS (
        SELECT user_id, session_id,
               LISTAGG(event_type, '>') WITHIN GROUP (ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM paths GROUP BY path ORDER BY n DESC, path LIMIT 15
    """,
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ), paths AS (
        SELECT user_id, session_id,
               STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM paths GROUP BY path ORDER BY n DESC, path LIMIT 15
    """,
    tables=("events",),
)


# CEP-lite sequence pattern matching (the MATCH_RECOGNIZE gap, reduced to
# its regex core): encode each user's time-ordered event stream as a code
# string, then count non-overlapping greedy matches of a pattern over it —
# 'vc+p' = view, one-or-more clicks, purchase. One groupBy assembles the
# per-user sequence (the only shuffle — |users| result rows); the regex
# runs per user string, never per event, and both engines' regex cores
# (Java util.regex / RE2) agree on greedy non-overlapping semantics for
# patterns without backrefs. Pattern spans beyond funnels/top-paths: those
# count FIXED stage chains, this matches an arbitrary regular language
# over the event alphabet.
pair(
    "events_pattern_match",
    """
    WITH coded AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
                    ELSE 's' END AS code
        FROM events
    ), seqs AS (
        SELECT user_id,
               LISTAGG(code, '') WITHIN GROUP (ORDER BY ts, event_id) AS seq
        FROM coded GROUP BY user_id
    ), m AS (
        SELECT user_id, regexp_extract_all(seq, 'vc+p', 0) AS ms FROM seqs
    )
    SELECT user_id,
           CAST(size(ms) AS BIGINT) AS n_matches,
           CAST(COALESCE(array_max(transform(ms, x -> length(x))), 0) AS BIGINT)
               AS longest_match
    FROM m ORDER BY user_id
    """,
    """
    WITH coded AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'error' THEN 'e'
                    ELSE 's' END AS code
        FROM events
    ), seqs AS (
        SELECT user_id,
               STRING_AGG(code, '' ORDER BY ts, event_id) AS seq
        FROM coded GROUP BY user_id
    ), m AS (
        SELECT user_id, regexp_extract_all(seq, 'vc+p') AS ms FROM seqs
    )
    SELECT user_id,
           CAST(LEN(ms) AS BIGINT) AS n_matches,
           CAST(COALESCE(list_max(list_transform(ms, x -> LENGTH(x))), 0) AS BIGINT)
               AS longest_match
    FROM m ORDER BY user_id
    """,
    tables=("events",),
)


# First-touch attribution: each user's conversion credited to the channel
# (event type) of their FIRST event — the marketing-attribution primitive.
# One ranked window + one tiny conversion aggregate; the rn=1 filter cuts
# the stream to |users| rows before the join.
twin(
    "events_attribution",
    """
    WITH ranked AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ),
    conv AS (
        SELECT user_id, COUNT(*) AS n_purchases FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT r.event_type AS first_touch,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(c.user_id) AS BIGINT) AS n_converted,
           CAST(COALESCE(SUM(c.n_purchases), 0) AS BIGINT) AS n_purchases
    FROM ranked r LEFT JOIN conv c ON r.user_id = c.user_id
    WHERE r.rn = 1
    GROUP BY r.event_type ORDER BY r.event_type
    """,
    tables=("events",),
)

# Time-weighted average (TWAP): each sample weighted by its holding
# duration until the next sample — the irregular-time-series average
# (financial TWAP / TimescaleDB time_weight shape). Durations are exact
# integer MICROSECONDS on both engines (Spark's whole-second
# UNIX_TIMESTAMP truncation vs DuckDB's fractional EPOCH was a measured
# sub-second mismatch); NTZ→TZ cast is value-preserving under the UTC
# session.
pair(
    "events_twap",
    """
    WITH w AS (
        SELECT user_id, DATE_TRUNC('day', ts) AS day, value, ts,
               LEAD(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts, event_id) AS nxt
        FROM events
    )
    SELECT user_id, day,
           CAST(COUNT(*) AS BIGINT) AS n_weighted,
           FLOOR(SUM(value * (UNIX_MICROS(CAST(nxt AS TIMESTAMP))
                              - UNIX_MICROS(CAST(ts AS TIMESTAMP))))
                 / SUM(UNIX_MICROS(CAST(nxt AS TIMESTAMP))
                       - UNIX_MICROS(CAST(ts AS TIMESTAMP))) * 10000) / 10000
               AS twap
    FROM w WHERE nxt IS NOT NULL AND nxt > ts
    GROUP BY user_id, day
    ORDER BY user_id, day
    """,
    """
    WITH w AS (
        SELECT user_id, DATE_TRUNC('day', ts) AS day, value, ts,
               LEAD(ts) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                              ORDER BY ts, event_id) AS nxt
        FROM events
    )
    SELECT user_id, day,
           CAST(COUNT(*) AS BIGINT) AS n_weighted,
           FLOOR(SUM(value * (EPOCH_US(nxt) - EPOCH_US(ts)))
                 / SUM(EPOCH_US(nxt) - EPOCH_US(ts)) * 10000) / 10000
               AS twap
    FROM w WHERE nxt IS NOT NULL AND nxt > ts
    GROUP BY user_id, day
    ORDER BY user_id, day
    """,
    tables=("events",),
)

# OHLC candlesticks per (series, day): open/close via forward/reverse
# ROW_NUMBERs (deterministic event_id tiebreaks — MIN_BY/ARG_MIN tie
# behavior is engine-defined, so ranked windows instead), high/low/count
# as plain aggregates. Both windows share one (event_type, day) exchange.
twin(
    "events_ohlc",
    """
    WITH r AS (
        SELECT event_type, DATE_TRUNC('day', ts) AS day, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, day,
           FLOOR(MAX(CASE WHEN rn_a = 1 THEN value END) * 10000) / 10000 AS open,
           FLOOR(MAX(value) * 10000) / 10000 AS high,
           FLOOR(MIN(value) * 10000) / 10000 AS low,
           FLOOR(MAX(CASE WHEN rn_d = 1 THEN value END) * 10000) / 10000 AS close,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM r GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    tables=("events",),
)


@register(
    "asof_tolerance_events",
    oracle="""
    SELECT p.event_id, p.user_id,
           CASE WHEN p.ts - v.ts <= INTERVAL 1 HOUR THEN ROUND(v.value, 2) END
               AS last_view_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
    """,
)
def asof_tolerance_events(spark, sf_dir):
    """As-of join with a max-staleness bound (operators.asof.asof_join
    tolerance=...): matches older than 1 hour are NULLed, pandas
    merge_asof tolerance semantics — left rows are kept either way. Same
    single union+carry shuffle as the unbounded form; the tolerance is a
    post-carry filter, not a different plan. Oracle: DuckDB ASOF LEFT
    JOIN with the gap test applied to the matched row."""
    from blazingsql_spark.operators import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    out = asof_join(
        purchases, views, on="ts", by=["user_id"],
        right_value_cols=["view_value"], tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    return out.select(
        "event_id", "user_id", F.round("view_value", 2).alias("last_view_value")
    ).orderBy("event_id")


# Winsorization: clip a metric to per-group percentile bands — the
# standard outlier-robust cleaning step before training/stats. The band
# table is |groups| rows (broadcast); clipping is scan-side LEAST/GREATEST.
@register(
    "agg_winsorize",
    oracle="""
    WITH bands AS (
        SELECT l_returnflag,
               PERCENTILE_CONT(0.05) WITHIN GROUP
                   (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS lo,
               PERCENTILE_CONT(0.95) WITHIN GROUP
                   (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN CAST(l_extendedprice AS DOUBLE) < lo
                           OR CAST(l_extendedprice AS DOUBLE) > hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           FLOOR(CAST(SUM(CAST(LEAST(GREATEST(CAST(l_extendedprice AS DOUBLE), lo),
                                     hi) AS DECIMAL(24,6))) AS DOUBLE)
                 * 100) / 100 AS sum_winsorized
    FROM lineitem l JOIN bands b ON l.l_returnflag = b.l_returnflag
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def agg_winsorize(spark, sf_dir):
    """Winsorize l_extendedprice to per-returnflag p05/p95 bands. The
    bands come from operators.stats.group_percentile_cont — the
    distributed rank-based exact percentile (bit-identical to
    PERCENTILE_CONT, which the oracle uses) — because Spark's built-in
    exact percentile buffers each group in ONE task: with 3 heavy groups
    that was measured 9.6x slower at 100x data, the few-big-groups wall
    this operator exists to avoid. Clipping is scan-side LEAST/GREATEST
    against the broadcast 3-row band table."""
    from blazingsql_spark.operators.stats import group_percentile_cont

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("price")
    )
    bands = group_percentile_cont(
        li, ["l_returnflag"], "price", {"lo": 0.05, "hi": 0.95}
    )
    clipped = li.join(F.broadcast(bands), "l_returnflag").select(
        "l_returnflag",
        "price",
        ((F.col("price") < F.col("lo")) | (F.col("price") > F.col("hi"))).alias(
            "__is_clip"
        ),
        # decimal cents-and-micros, not double: the per-group SUM must be
        # exact regardless of partial-aggregation order (same reassociation
        # hazard the gate caught in merge_upsert_orders)
        F.least(F.greatest(F.col("price"), F.col("lo")), F.col("hi"))
        .cast("decimal(24,6)")
        .alias("__w"),
    )
    return (
        clipped.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("__is_clip").cast("int")).cast("long").alias("n_clipped"),
            (F.floor(F.sum("__w").cast("double") * 100) / 100).alias(
                "sum_winsorized"
            ),
        )
        .orderBy("l_returnflag")
    )


# Robust outlier detection via median absolute deviation: MAD is the
# robust scale estimate (insensitive to the outliers it hunts, unlike
# stddev). Two distributed-percentile passes (operators.stats), band
# tables broadcast, the flag a scan-side comparison.
@register(
    "agg_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT l_returnflag,
               PERCENTILE_CONT(0.5) WITHIN GROUP
                   (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS med
        FROM lineitem GROUP BY l_returnflag
    ),
    dev AS (
        SELECT l.l_returnflag, m.med,
               CAST(l_extendedprice AS DOUBLE) AS v,
               ABS(CAST(l_extendedprice AS DOUBLE) - m.med) AS ad
        FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
    ),
    mad AS (
        SELECT l_returnflag,
               PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY ad) AS mad
        FROM dev GROUP BY l_returnflag
    )
    SELECT d.l_returnflag,
           FLOOR(MIN(d.med) * 100) / 100 AS median_price,
           FLOOR(MIN(mad.mad) * 100) / 100 AS mad_price,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d.ad > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
    FROM dev d JOIN mad ON d.l_returnflag = mad.l_returnflag
    GROUP BY d.l_returnflag
    ORDER BY d.l_returnflag
    """,
)
def agg_mad_outliers(spark, sf_dir):
    """Median-absolute-deviation outlier flagging per group: both the
    median and the MAD come from operators.stats.group_percentile_cont
    (the distributed rank-based exact percentile), so no task ever
    buffers a group. |v - median| > 3 * MAD marks the outlier — the
    robust-statistics standard where mean/stddev are themselves dragged
    by the outliers being hunted."""
    from blazingsql_spark.operators.stats import group_percentile_cont

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("v")
    )
    med = group_percentile_cont(li, ["l_returnflag"], "v", {"med": 0.5})
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", "med", "v", F.abs(F.col("v") - F.col("med")).alias("ad")
    )
    mad = group_percentile_cont(dev, ["l_returnflag"], "ad", {"mad": 0.5})
    flagged = dev.join(F.broadcast(mad), "l_returnflag")
    return (
        flagged.groupBy("l_returnflag")
        .agg(
            (F.floor(F.min("med") * 100) / 100).alias("median_price"),
            (F.floor(F.min("mad") * 100) / 100).alias("mad_price"),
            F.count("*").cast("long").alias("n"),
            F.sum((F.col("ad") > 3 * F.col("mad")).cast("int"))
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "interval_join_events",
    oracle="""
    WITH p AS (
        SELECT event_id AS p_id, user_id,
               EPOCH_US(ts) AS p_start, EPOCH_US(ts) + 600000000 AS p_end
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT event_id AS v_id, user_id,
               EPOCH_US(ts) AS v_start, EPOCH_US(ts) + 600000000 AS v_end
        FROM events WHERE event_type = 'view'
    )
    SELECT p.p_id, CAST(COUNT(v.v_id) AS BIGINT) AS n_overlaps,
           CAST(COALESCE(MIN(v.v_id), -1) AS BIGINT) AS first_view
    FROM p LEFT JOIN v
      ON p.user_id = v.user_id
     AND p.p_start < v.v_end AND v.v_start < p.p_end
    GROUP BY p.p_id
    ORDER BY p.p_id
    """,
)
def interval_join_events(spark, sf_dir):
    """Interval-overlap join (operators.asof.interval_join): each
    purchase's 10-minute activity window joined to every view window of
    the same user it overlaps. Bucketized equi-join on (user, bucket) +
    exact post-filter + stateless first-shared-bucket dedup — never the
    nested-loop theta join this predicate naively plans to. Oracle: the
    plain inequality join (fine at oracle scale)."""
    from blazingsql_spark.operators.asof import interval_join

    ev = load_table(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id",
        micros.alias("p_start"), (micros + 600000000).alias("p_end"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"), "user_id",
        micros.alias("v_start"), (micros + 600000000).alias("v_end"),
    )
    pairs = interval_join(
        p, v, "p_start", "p_end", "v_start", "v_end",
        bucket_width=600000000, by=["user_id"],
    )
    counted = pairs.groupBy("p_id").agg(
        F.count("v_id").cast("long").alias("n_overlaps"),
        F.min("v_id").alias("first_view"),
    )
    return (
        p.select("p_id")
        .join(counted, "p_id", "left")
        .select(
            "p_id",
            F.coalesce(F.col("n_overlaps"), F.lit(0)).cast("long").alias("n_overlaps"),
            F.coalesce(F.col("first_view"), F.lit(-1)).cast("long").alias("first_view"),
        )
        .orderBy("p_id")
    )


# Equi-depth (equal-frequency) histogram: decile edges of a global
# column — the empty-keys path of the distributed percentile (one global
# range sort, chunked rank offsets; the only single-partition stage is
# the n_chunks-row offset table). Exactly the NDV/selectivity statistic
# a CBO's histogram wants.
@register(
    "agg_equidepth",
    oracle=f"""
    SELECT {', '.join(f"PERCENTILE_CONT({i / 10.0}) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DOUBLE)) AS p{i * 10}" for i in range(1, 10))}
    FROM orders
    """,
)
def agg_equidepth(spark, sf_dir):
    """Global decile edges of o_totalprice via operators.stats
    .group_percentile_cont with NO group keys — nine order statistics
    from one distributed rank pass (vs nine single-task buffered
    percentile aggregates built-in). Bit-identical to PERCENTILE_CONT."""
    from blazingsql_spark.operators.stats import group_percentile_cont

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("v")
    )
    qs = {f"p{i * 10}": i / 10.0 for i in range(1, 10)}
    return group_percentile_cont(orders, [], "v", qs).select(
        *[f"p{i * 10}" for i in range(1, 10)]
    )


@register(
    "merge_upsert_orders",
    oracle="""
    WITH src AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2))
                   AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT (SELECT MAX(o_orderkey) FROM orders) + 1, 1, 'O',
               CAST(100.00 AS DECIMAL(18,2))
    ),
    kept AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
    ),
    merged AS (SELECT * FROM kept UNION ALL SELECT * FROM src)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           CAST(SUM(o_totalprice) AS DOUBLE) AS sum_price
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def merge_upsert_orders(spark, sf_dir):
    """MERGE upsert semantics, driver-checked (operators.merge
    .merge_upsert): a CDC batch (every 10th order repriced x2, plus one
    brand-new key) merged into orders — source wins on conflict,
    unmatched target rows survive, the insert lands. One anti-join + one
    union, both shuffling on the merge key (co-partitioned at scale).
    The oracle builds the identical batch and verifies the merged
    table's per-status counts, max key, and price mass."""
    from blazingsql_spark.operators.merge import merge_upsert

    # DECIMAL cents, not DOUBLE: the per-status SUM is exact regardless of
    # partial-aggregation order (a double sum's low bits vary with the
    # partition plan and once straddled the FLOOR grid in a full-registry
    # session — the gate caught it)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    max_key = orders.agg(F.max("o_orderkey")).first()[0]
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        (F.col("o_totalprice") * 2).cast("decimal(18,2)").alias("o_totalprice"),
    )
    inserts = spark.createDataFrame(
        [(max_key + 1, 1, "O")], ["o_orderkey", "o_custkey", "o_orderstatus"]
    ).withColumn("o_totalprice", F.lit("100.00").cast("decimal(18,2)"))
    merged = merge_upsert(orders, updates.unionByName(inserts), ["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max("o_orderkey").cast("long").alias("max_key"),
            F.sum("o_totalprice").cast("double").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "scd2_orders",
    oracle="""
    WITH dim AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               CAST(o_orderdate AS TIMESTAMP) AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(price * 2 AS DECIMAL(18,2)) AS price
        FROM dim WHERE o_orderkey % 10 = 0
    ),
    closed AS (
        SELECT o_orderkey, o_orderstatus, price, valid_from,
               TIMESTAMP '1999-01-01 00:00:00' AS valid_to
        FROM dim WHERE o_orderkey IN (SELECT o_orderkey FROM upd)
    ),
    untouched AS (
        SELECT * FROM dim WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
    ),
    new_rows AS (
        SELECT o_orderkey, o_orderstatus, price,
               TIMESTAMP '1999-01-01 00:00:00' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM upd
    ),
    scd AS (
        SELECT * FROM closed UNION ALL
        SELECT * FROM untouched UNION ALL
        SELECT * FROM new_rows
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_current,
           CAST(SUM(CASE WHEN valid_to IS NULL THEN price
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               AS current_price_mass
    FROM scd GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def scd2_orders(spark, sf_dir):
    """SCD2 dimension maintenance, driver-checked (operators.merge
    .scd2_apply): every 10th order repriced — its current row is CLOSED
    at the effective timestamp and a new current version appended;
    history is append-only and untouched rows keep valid_to = NULL. Two
    key-partitioned joins, no window over history. The oracle replays the
    close-and-append algebra in SQL and checks per-status row counts,
    current-row counts, and current price mass."""
    from blazingsql_spark.operators.merge import scd2_apply

    dim = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.col("o_orderdate").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = dim.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", "o_orderstatus",
        (F.col("price") * 2).cast("decimal(18,2)").alias("price"),
    )
    out = scd2_apply(
        dim, updates, ["o_orderkey"],
        effective_ts=F.to_timestamp(F.lit("1999-01-01 00:00:00")),
    )
    return (
        out.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("valid_to").isNull().cast("int")).cast("long").alias("n_current"),
            F.sum(
                F.when(F.col("valid_to").isNull(), F.col("price")).otherwise(
                    F.lit("0").cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("current_price_mass"),
        )
        .orderBy("o_orderstatus")
    )


# Deterministic MODE: built-in mode() tie-breaking is engine-defined, so
# compute it as count + per-group top-1 with an explicit value tiebreak —
# also the SCALABLE shape (two partial-aggregated phases + a |distinct
# values|-sized window), where a naive mode buffers the group.
twin(
    "agg_mode",
    """
    WITH c AS (
        SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    r AS (
        SELECT l_returnflag, l_quantity, cnt,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, l_quantity) AS rn
        FROM c
    )
    SELECT l_returnflag, ROUND(l_quantity, 2) AS mode_qty,
           CAST(cnt AS BIGINT) AS n
    FROM r WHERE rn = 1 ORDER BY l_returnflag
    """,
    tables=("lineitem",),
)


@register(
    "cdc_apply_orders",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        FROM orders
    ),
    changes AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice * 3 AS DECIMAL(18,2)) AS o_totalprice,
               'U' AS op, 1 AS version
        FROM base WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(NULL AS DECIMAL(18,2)), 'D', 2
        FROM base WHERE o_orderkey % 14 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice * 5 AS DECIMAL(18,2)), 'U', 2
        FROM base WHERE o_orderkey % 21 = 0
        UNION ALL
        SELECT (SELECT MAX(o_orderkey) FROM base) + 1, 1, 'O',
               CAST(42.42 AS DECIMAL(18,2)), 'I', 1
    ),
    latest AS (
        SELECT * FROM (
            SELECT c.*, ROW_NUMBER() OVER (
                PARTITION BY o_orderkey
                ORDER BY version DESC,
                         CASE WHEN op = 'D' THEN 1 ELSE 0 END DESC) AS rn
            FROM changes c) t
        WHERE rn = 1
    ),
    survivors AS (
        SELECT b.* FROM base b
        WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM latest)
    ),
    cur AS (
        SELECT * FROM survivors
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM latest WHERE op <> 'D'
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           CAST(SUM(o_totalprice) AS DOUBLE) AS sum_price
    FROM cur GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def cdc_apply_orders(spark, sf_dir):
    """CDC log application (operators.merge.cdc_apply): a multi-version
    change stream — v1 reprice x3 on every 7th key, v2 delete on every
    14th, v2 reprice x5 on every 21st, one insert — collapses to
    latest-version-wins with delete tombstones. Keys divisible by 42
    carry a same-version U and D pair, pinning the deterministic
    delete-wins tie-break. One window over the log + one co-partitioned
    anti-join/union against the snapshot; the oracle replays the same
    log declaratively."""
    from blazingsql_spark.operators.merge import cdc_apply

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    max_key = base.agg(F.max("o_orderkey")).first()[0]

    def chg(cond_mod, mult, op, version):
        out = base.filter(F.col("o_orderkey") % cond_mod == 0).select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            (F.col("o_totalprice") * mult).cast("decimal(18,2)").alias("o_totalprice")
            if mult is not None
            else F.lit(None).cast("decimal(18,2)").alias("o_totalprice"),
        )
        return out.withColumn("op", F.lit(op)).withColumn("version", F.lit(version))

    inserts = (
        spark.createDataFrame([(max_key + 1, 1, "O")],
                              ["o_orderkey", "o_custkey", "o_orderstatus"])
        .withColumn("o_totalprice", F.lit("42.42").cast("decimal(18,2)"))
        .withColumn("op", F.lit("I"))
        .withColumn("version", F.lit(1))
    )
    changes = (
        chg(7, 3, "U", 1)
        .unionByName(chg(14, None, "D", 2))
        .unionByName(chg(21, 5, "U", 2))
        .unionByName(inserts)
    )
    cur = cdc_apply(base, changes, ["o_orderkey"])
    return (
        cur.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max("o_orderkey").cast("long").alias("max_key"),
            F.sum("o_totalprice").cast("double").alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


# Z-order (Morton) key — the multi-column data-skipping layout primitive
# (operators.zorder). The oracle spells the identical shift/mask
# arithmetic, generated once at import for 16 bits x 2 columns.
_Z_TERMS_SQL = " + ".join(
    f"(((pk >> {i}) & 1) << {2 * i}) + (((sk >> {i}) & 1) << {2 * i + 1})"
    for i in range(16)
)


@register(
    "zorder_values",
    oracle=f"""
    WITH b AS (
        SELECT l_orderkey, l_linenumber,
               l_partkey % 65536 AS pk, l_suppkey % 65536 AS sk
        FROM lineitem WHERE l_orderkey % 50 = 0
    )
    SELECT l_orderkey, l_linenumber, CAST({_Z_TERMS_SQL} AS BIGINT) AS z
    FROM b ORDER BY l_orderkey, l_linenumber
    """,
)
def zorder_values(spark, sf_dir):
    """Morton z-values over (l_partkey, l_suppkey) — the engine-portable
    core of OPTIMIZE ZORDER BY (sources.layout.zorder_key, the key the
    clustered writer zorder_write lays files out by): pure integer
    shift/mask interleave, map-only. The LAYOUT effect (tight per-file
    bounding boxes on both columns) is asserted structurally over real
    parquet footers in tests/test_scale.py and per-file spans in
    tests/test_sources.py; this row pins the key arithmetic bit-for-bit
    against an independent SQL spelling."""
    from blazingsql_spark.sources.layout import zorder_key

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    z = zorder_key(
        [F.pmod(F.col("l_partkey"), F.lit(65536)),
         F.pmod(F.col("l_suppkey"), F.lit(65536))],
        16,
    )
    return li.select(
        "l_orderkey", "l_linenumber", z.alias("z")
    ).orderBy("l_orderkey", "l_linenumber")
