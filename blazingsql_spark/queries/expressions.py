"""Scalar expression / function surface (SURVEY §2.7) — one query per
category of the reference's canonical operator map
(/root/reference/engine/src/parser/expression_utils.cpp:271-347).

Dialect notes baked into the oracles:
- DuckDB regexp_replace needs the 'g' flag for global (Spark is global).
- DuckDB dayofweek() is 0=Sunday; Spark is 1=Sunday → oracle adds 1.
- DuckDB CAST(double AS INT) rounds; Spark truncates → oracle uses TRUNC.
- DuckDB has no INITCAP → covered in unit tests, not oracle-compared.
- Transcendentals (sin/ln/...) differ in the last ulp between libm and JVM →
  ROUND(..., 6).
"""

from blazingsql_spark.queries.registry import pair, twin

# Comparison / boolean / IS [NOT] NULL / BETWEEN / IN — expression_utils.cpp:318-332,296-297
twin(
    "expr_predicates",
    """
    SELECT l_orderkey, l_linenumber,
           l_quantity > 25                                   AS gt,
           l_quantity <= 10                                  AS lte,
           l_returnflag = 'R'                                AS eq,
           l_returnflag <> 'N'                               AS neq,
           l_discount BETWEEN 0.02 AND 0.08                  AS btw,
           l_linestatus IN ('O')                             AS inset,
           NULLIF(l_linenumber, 3) IS NULL                   AS isn,
           NOT (l_quantity > 25)                             AS negated,
           (l_quantity > 25 AND l_discount < 0.05)           AS conj,
           (l_returnflag = 'A' OR l_returnflag = 'R')        AS disj
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    tables=("lineitem",),
)

# Arithmetic + math — expression_utils.cpp:271-330.
twin(
    "expr_math",
    """
    SELECT l_orderkey, l_linenumber,
           -- IEEE-deterministic ops get the FLOOR grid (bit-identical in any
           -- engine); ROUND(x, k) can disagree on the SAME double because
           -- Java rounds the shortest decimal repr while C rounds the binary
           -- value (seen at sf0.1: 2147.0228125 → ...813 vs ...812).
           FLOOR((l_extendedprice + l_tax) * 10000) / 10000      AS add_v,
           FLOOR((l_extendedprice - l_discount) * 10000) / 10000 AS sub_v,
           FLOOR(l_quantity * l_discount * 1000000) / 1000000    AS mul_v,
           FLOOR(l_extendedprice / l_quantity * 10000) / 10000   AS div_v,
           MOD(l_orderkey, 7)                       AS mod_v,
           -- CAST: Spark FLOOR/CEIL return BIGINT, DuckDB DOUBLE — the
           -- r2 hash mismatch was this result-type gap, not the values
           CAST(FLOOR(l_extendedprice) AS DOUBLE)   AS floor_v,
           CAST(CEIL(l_extendedprice) AS DOUBLE)    AS ceil_v,
           ABS(l_discount - 0.05)                   AS abs_v,
           -- transcendentals differ at 1 ulp between JVM and libm anyway:
           -- coarse ROUND is the right tool (tie probability ~ulp/grid)
           ROUND(SIN(l_discount), 6)                AS sin_v,
           ROUND(COS(l_discount), 6)                AS cos_v,
           ROUND(TAN(l_discount), 6)                AS tan_v,
           ROUND(ASIN(l_discount), 6)               AS asin_v,
           ROUND(ACOS(l_discount), 6)               AS acos_v,
           ROUND(ATAN(l_discount), 6)               AS atan_v,
           ROUND(LN(l_extendedprice), 6)            AS ln_v,
           ROUND(LOG10(l_extendedprice), 6)         AS log10_v,
           ROUND(POWER(l_quantity, 2), 4)           AS pow_v,
           FLOOR(SQRT(l_quantity) * 1000000) / 1000000 AS sqrt_v,
           ROUND(1.0 / TAN(l_discount + 0.01), 4)   AS cotan_v
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    tables=("lineitem",),
)

# String ops — expression_utils.cpp:311-315,334-345; LIKE→regex at
# LogicalProject.cpp:31-48, TRIM :50-60.
pair(
    "expr_string",
    """
    SELECT c_custkey,
           UPPER(c_name)                         AS up,
           LOWER(c_mktsegment)                   AS lo,
           SUBSTRING(c_name, 1, 8)               AS sub,
           LENGTH(c_name)                        AS len,
           REPLACE(c_name, '#', '-')             AS rep,
           CONCAT(c_name, '|', c_mktsegment)     AS cat,
           c_name || '!'                         AS cat2,
           TRIM('  ' || c_name || ' ')           AS trimmed,
           LTRIM(' ' || c_name)                  AS ltrimmed,
           RTRIM(c_name || ' ')                  AS rtrimmed,
           LEFT(c_name, 4)                       AS l4,
           RIGHT(c_name, 4)                      AS r4,
           REVERSE(c_mktsegment)                 AS rev,
           c_name LIKE 'Customer%1'              AS like_v,
           REGEXP_REPLACE(c_name, '[0-9]', 'x')  AS rex,
           CHAR_LENGTH(c_name)                   AS clen,
           INSTR(c_name, '#')                    AS pos_hash,
           POSITION('0' IN c_name)               AS pos_zero
    FROM customer
    ORDER BY c_custkey
    """,
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                         AS up,
           LOWER(c_mktsegment)                   AS lo,
           SUBSTRING(c_name, 1, 8)               AS sub,
           LENGTH(c_name)                        AS len,
           REPLACE(c_name, '#', '-')             AS rep,
           CONCAT(c_name, '|', c_mktsegment)     AS cat,
           c_name || '!'                         AS cat2,
           TRIM('  ' || c_name || ' ')           AS trimmed,
           LTRIM(' ' || c_name)                  AS ltrimmed,
           RTRIM(c_name || ' ')                  AS rtrimmed,
           LEFT(c_name, 4)                       AS l4,
           RIGHT(c_name, 4)                      AS r4,
           REVERSE(c_mktsegment)                 AS rev,
           c_name LIKE 'Customer%1'              AS like_v,
           REGEXP_REPLACE(c_name, '[0-9]', 'x', 'g') AS rex,
           LENGTH(c_name)                        AS clen,
           CAST(INSTR(c_name, '#') AS INT)       AS pos_hash,
           CAST(POSITION('0' IN c_name) AS INT)  AS pos_zero
    FROM customer
    ORDER BY c_custkey
    """,
    tables=("customer",),
)

# Date/time — EXTRACT family (expression_utils.cpp:289-295,1095-1101),
# TO_DATE/TO_TIMESTAMP (:338-339), TIMESTAMPADD/DIFF (TimestampaddSuite.yaml).
pair(
    "expr_datetime",
    """
    SELECT o_orderkey,
           YEAR(o_orderdate)                      AS y,
           MONTH(o_orderdate)                     AS m,
           DAY(o_orderdate)                       AS d,
           HOUR(o_orderdate)                      AS h,
           MINUTE(o_orderdate)                    AS mi,
           SECOND(o_orderdate)                    AS s,
           DAYOFWEEK(o_orderdate)                 AS dow,
           DATE_TRUNC('month', o_orderdate)       AS month_start,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS od,
           TIMESTAMPADD(DAY, 30, o_orderdate)     AS due,
           TIMESTAMPDIFF(DAY, o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           CAST(TO_DATE('1997-03-15', 'yyyy-MM-dd') AS TIMESTAMP) AS parsed_date,
           CURRENT_DATE >= DATE '2020-01-01'      AS after_2020
    FROM orders
    WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           YEAR(o_orderdate)                      AS y,
           MONTH(o_orderdate)                     AS m,
           DAY(o_orderdate)                       AS d,
           HOUR(o_orderdate)                      AS h,
           MINUTE(o_orderdate)                    AS mi,
           SECOND(o_orderdate)                    AS s,
           DAYOFWEEK(o_orderdate) + 1             AS dow,
           DATE_TRUNC('month', o_orderdate)       AS month_start,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS od,
           o_orderdate + INTERVAL 30 DAY          AS due,
           DATE_DIFF('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           STRPTIME('1997-03-15', '%Y-%m-%d')     AS parsed_date,
           CURRENT_DATE >= DATE '2020-01-01'      AS after_2020
    FROM orders
    WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
    tables=("orders",),
)

# EXTRACT spellings (BL_YEAR..BL_SECOND mapping, expression_utils.cpp:1095-1101).
twin(
    "expr_extract",
    """
    SELECT event_id,
           EXTRACT(YEAR FROM ts)   AS ey,
           EXTRACT(MONTH FROM ts)  AS em,
           EXTRACT(DAY FROM ts)    AS ed,
           EXTRACT(HOUR FROM ts)   AS eh,
           EXTRACT(MINUTE FROM ts) AS emi,
           CAST(FLOOR(EXTRACT(SECOND FROM ts)) AS INT) AS es
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
    tables=("events",),
)

# CASE / COALESCE / NULLIF — expression_tree.cpp:186-215 (MAGIC_IF_NOT),
# caseSuite.yaml, coalesceSuite.yaml.
twin(
    "expr_case",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'small' END                        AS bucket,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'filled'
                              ELSE 'partial' END        AS status_name,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS coalesced,
           NULLIF(o_orderstatus, 'F') IS NULL           AS was_filled
    FROM orders
    ORDER BY o_orderkey
    """,
    tables=("orders",),
)

# CAST family — expression_utils.cpp:298-310. DuckDB double→int CAST rounds
# half-even while Spark truncates toward zero → oracle TRUNCs first.
pair(
    "expr_cast",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INT)           AS qty_int,
           CAST(l_quantity AS BIGINT)        AS qty_long,
           CAST(l_linenumber AS SMALLINT)    AS ln_small,
           CAST(l_linenumber AS TINYINT)     AS ln_tiny,
           CAST(l_orderkey AS DOUBLE)        AS ok_dbl,
           CAST(l_orderkey AS FLOAT)         AS ok_flt,
           CAST(l_orderkey AS STRING)        AS ok_str,
           CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date,
           CAST('123' AS INT)                AS lit_int,
           CAST(CAST('1996-05-01' AS DATE) AS TIMESTAMP) AS lit_date,
           CAST('1996-05-01 12:30:00' AS TIMESTAMP) AS lit_ts
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(TRUNC(l_quantity) AS INT)    AS qty_int,
           CAST(TRUNC(l_quantity) AS BIGINT) AS qty_long,
           CAST(l_linenumber AS SMALLINT)    AS ln_small,
           CAST(l_linenumber AS TINYINT)     AS ln_tiny,
           CAST(l_orderkey AS DOUBLE)        AS ok_dbl,
           CAST(l_orderkey AS FLOAT)         AS ok_flt,
           CAST(l_orderkey AS VARCHAR)       AS ok_str,
           CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date,
           CAST('123' AS INT)                AS lit_int,
           CAST(CAST('1996-05-01' AS DATE) AS TIMESTAMP) AS lit_date,
           CAST('1996-05-01 12:30:00' AS TIMESTAMP) AS lit_ts
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    tables=("lineitem",),
)

# Bitwise ops — expression_utils.cpp:87-89.
pair(
    "expr_bitwise",
    """
    SELECT l_orderkey,
           l_orderkey & 255  AS band,
           l_orderkey | 16   AS bor,
           CAST(l_orderkey AS INT) ^ 5 AS bxor
    FROM lineitem
    WHERE l_orderkey < 300 AND l_linenumber = 1
    ORDER BY l_orderkey
    """,
    # DuckDB ^ is exponentiation; its bitwise xor is xor().
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255  AS band,
           l_orderkey | 16   AS bor,
           XOR(CAST(l_orderkey AS INT), 5) AS bxor
    FROM lineitem
    WHERE l_orderkey < 300 AND l_linenumber = 1
    ORDER BY l_orderkey
    """,
    tables=("lineitem",),
)

# Interval / DURATION arithmetic — intervalSuite.yaml, DURATION type support
# (CHANGELOG #1523). Spark DayTimeInterval == reference DURATION.
pair(
    "expr_interval",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 7 DAY     AS plus_week,
           o_orderdate - INTERVAL 12 HOUR   AS minus_half_day,
           o_orderdate + INTERVAL 1 MONTH   AS next_month,
           TIMESTAMPDIFF(SECOND, o_orderdate, o_orderdate + INTERVAL 90 MINUTE)
               AS gap_seconds,
           DATEDIFF(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_since
    FROM orders
    WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 7 DAY     AS plus_week,
           o_orderdate - INTERVAL 12 HOUR   AS minus_half_day,
           o_orderdate + INTERVAL 1 MONTH   AS next_month,
           DATE_DIFF('second', o_orderdate, o_orderdate + INTERVAL 90 MINUTE)
               AS gap_seconds,
           DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
    FROM orders
    WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
    tables=("orders",),
)

# IS [NOT] TRUE / FALSE — expression_utils.cpp:274-277.
twin(
    "expr_is_truth",
    """
    SELECT l_orderkey, l_linenumber,
           (l_quantity > 25) IS TRUE      AS is_true_v,
           (l_quantity > 25) IS NOT TRUE  AS not_true_v,
           (l_quantity > 25) IS FALSE     AS is_false_v,
           (NULLIF(l_linenumber, 3) > 2) IS NOT FALSE AS not_false_v
    FROM lineitem
    WHERE l_orderkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tables=("lineitem",),
)

# TO_TIMESTAMP (expression_utils.cpp:339) — format-string parse.
pair(
    "expr_to_timestamp",
    """
    SELECT o_orderkey,
           TO_TIMESTAMP('1997-03-15 10:30:00', 'yyyy-MM-dd HH:mm:ss') AS parsed_ts,
           UNIX_TIMESTAMP(o_orderdate) AS epoch_s
    FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           STRPTIME('1997-03-15 10:30:00', '%Y-%m-%d %H:%M:%S') AS parsed_ts,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """,
    tables=("orders",),
)


# RAND (BLZ_RAND, expression_utils.cpp:13) — values are engine-random (the
# reference's BLZ_RAND likewise), so the checkable output is the *properties*
# of the distribution, which ARE deterministic: row count, range bounds, and
# rough uniformity. The oracle asserts the same count plus literal TRUEs.
from blazingsql_spark.queries.registry import register  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


@register(
    "expr_rand",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS lo_ok, TRUE AS hi_ok, TRUE AS spread_ok
    FROM lineitem
    """,
)
def expr_rand(spark, sf_dir):
    """RAND parity: uniform [0,1) column. Raw values are engine-random, so
    the query returns deterministic distribution properties (count, bounds,
    spread) that the oracle can assert as literals."""
    from blazingsql_spark.queries.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", F.rand(seed=42).alias("r"))
        .agg(
            F.count("*").alias("n"),
            (F.min("r") >= 0).alias("lo_ok"),
            (F.max("r") < 1).alias("hi_ok"),
            # uniform draws must hit every decile of [0,1)
            (F.count_distinct(F.floor(F.col("r") * 10)) == 10).alias("spread_ok"),
        )
    )

# Literal-only expressions — literalSuite.yaml parity.
twin(
    "expr_literals",
    """
    SELECT r_regionkey,
           2 + 3                       AS int_lit,
           CAST(2.5 AS DOUBLE) * 4    AS dbl_lit,
           'abc' || 'def'             AS str_lit,
           TRUE AND FALSE             AS bool_lit,
           CAST(DATE '1999-12-31' AS TIMESTAMP) AS date_lit_as_ts,
           CAST(NULL AS INT)          AS null_lit
    FROM region
    ORDER BY r_regionkey
    """,
    tables=("region",),
)


# Array/list expression surface — dialect-divergent spellings (Spark
# ARRAY/SIZE/ELEMENT_AT vs DuckDB [..]/LEN/[idx]), identical semantics.
pair(
    "expr_array",
    """
    SELECT l_orderkey, l_linenumber,
           SIZE(ARRAY(l_orderkey, l_partkey, l_suppkey))                 AS arr_len,
           ELEMENT_AT(ARRAY(l_orderkey, l_partkey, l_suppkey), 2)       AS second,
           ARRAY_CONTAINS(ARRAY(l_orderkey, l_partkey, l_suppkey), l_suppkey) AS has_supp,
           ARRAY_MAX(ARRAY(l_orderkey, l_partkey, l_suppkey))           AS amax,
           ARRAY_MIN(ARRAY(l_orderkey, l_partkey, l_suppkey))           AS amin,
           ARRAY_JOIN(SORT_ARRAY(ARRAY(l_suppkey, l_partkey)), ',')     AS sorted2,
           ARRAY_JOIN(SLICE(ARRAY(l_orderkey, l_partkey, l_suppkey), 1, 2), ',') AS first2,
           ARRAY_JOIN(SORT_ARRAY(ARRAY_DISTINCT(ARRAY(l_orderkey, l_orderkey, l_partkey))), ',') AS dedup
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           LEN([l_orderkey, l_partkey, l_suppkey])                      AS arr_len,
           [l_orderkey, l_partkey, l_suppkey][2]                        AS second,
           LIST_CONTAINS([l_orderkey, l_partkey, l_suppkey], l_suppkey) AS has_supp,
           LIST_MAX([l_orderkey, l_partkey, l_suppkey])                 AS amax,
           LIST_MIN([l_orderkey, l_partkey, l_suppkey])                 AS amin,
           ARRAY_TO_STRING(LIST_SORT([l_suppkey, l_partkey]), ',')      AS sorted2,
           ARRAY_TO_STRING(LIST_SLICE([l_orderkey, l_partkey, l_suppkey], 1, 2), ',') AS first2,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT([l_orderkey, l_orderkey, l_partkey])), ',') AS dedup
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
    tables=("lineitem",),
)


# Padding/repetition/charcode string surface (reference string kernel
# extensions; both dialects share these spellings).
twin(
    "expr_string_pad",
    """
    SELECT c_custkey,
           LPAD(CAST(c_custkey AS STRING), 8, '0')    AS padded_id,
           RPAD(c_mktsegment, 12, '.')                AS seg_cell,
           REPEAT('-', 5)                             AS rule,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou')  AS lower_vowels,
           ASCII(SUBSTRING(c_name, 1, 1))             AS first_code,
           CHR(65 + CAST(c_custkey % 26 AS INT))      AS cycle_char
    FROM customer
    ORDER BY c_custkey
    """,
    tables=("customer",),
)


# Map expression surface — dialect-divergent construction (Spark MAP(k,v)
# vs DuckDB MAP {k: v}; DuckDB's [] extraction yields a 1-element list).
pair(
    "expr_map",
    """
    SELECT o_orderkey,
           ELEMENT_AT(MAP('ok', o_orderkey, 'ck', o_custkey), 'ck') AS ck_val,
           SIZE(MAP('ok', o_orderkey, 'ck', o_custkey))             AS m_size,
           ARRAY_JOIN(SORT_ARRAY(MAP_KEYS(MAP('ok', o_orderkey, 'ck', o_custkey))), ',') AS m_keys
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
           MAP {'ok': o_orderkey, 'ck': o_custkey}['ck'][1]         AS ck_val,
           CAST(CARDINALITY(MAP {'ok': o_orderkey, 'ck': o_custkey}) AS INT) AS m_size,
           ARRAY_TO_STRING(LIST_SORT(MAP_KEYS(MAP {'ok': o_orderkey, 'ck': o_custkey})), ',') AS m_keys
    FROM orders
    WHERE o_orderkey < 100
    ORDER BY o_orderkey
    """,
    tables=("orders",),
)

# UNPIVOT (wide → long) — the inverse of pivot_status; both dialects speak
# the SQL-standard form.
twin(
    "unpivot_metrics",
    """
    SELECT o_orderkey, metric, val
    FROM (
        SELECT o_orderkey, o_totalprice AS price, CAST(o_custkey AS DOUBLE) AS cust
        FROM orders WHERE o_orderkey < 200
    ) UNPIVOT (val FOR metric IN (price, cust))
    ORDER BY o_orderkey, metric
    """,
    tables=("orders",),
)


# TRY_CAST: malformed input → NULL instead of error (both dialects).
twin(
    "expr_try_cast",
    """
    SELECT c_custkey,
           TRY_CAST(c_name AS DOUBLE)                        AS bad_double,
           TRY_CAST(CAST(c_custkey AS STRING) AS INT)        AS good_int,
           CAST(TRY_CAST(c_mktsegment AS DATE) AS TIMESTAMP) AS bad_date,
           CAST(TRY_CAST('1997-03-15' AS DATE) AS TIMESTAMP) AS good_date
    FROM customer
    ORDER BY c_custkey
    """,
    tables=("customer",),
)

# GREATEST / LEAST n-ary comparisons.
twin(
    "expr_greatest_least",
    """
    SELECT l_orderkey, l_linenumber,
           GREATEST(l_quantity, l_discount * 100, 10.0) AS g,
           LEAST(l_quantity, l_extendedprice / 1000, 49.0) AS l
    FROM lineitem
    WHERE l_orderkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tables=("lineitem",),
)


# LIKE wildcard forms (reference wildCardSuite): %, _, NOT LIKE, ESCAPE.
twin(
    "expr_like_wildcards",
    """
    SELECT c_custkey, c_name,
           c_name LIKE 'Customer%'        AS pre,
           c_name LIKE '%1'               AS suf,
           c_name LIKE 'Customer#_'       AS one_char,
           c_name LIKE '%er#1%'           AS mid,
           c_name NOT LIKE '%0%'          AS no_zero,
           c_mktsegment LIKE 'BUIL_ING'   AS underscore,
           c_name LIKE 'Customer#!_1%' ESCAPE '!' AS literal_underscore
    FROM customer
    ORDER BY c_custkey
    """,
    tables=("customer",),
)


# JSON extraction over the events.props payload column (semi-structured
# columns are first-class in a log-analytics engine). Dialect-divergent
# spelling: Spark get_json_object($.path) vs DuckDB json_extract.
pair(
    "expr_json",
    """
    SELECT event_type,
           CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(CASE WHEN CAST(get_json_object(props, '$.k') AS BIGINT) > 50
                           THEN 1 END) AS BIGINT) AS n_gt50,
           CAST(COUNT(CASE WHEN get_json_object(props, '$.missing') IS NULL
                           THEN 1 END) AS BIGINT) AS n_null_path
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
                           THEN 1 END) AS BIGINT) AS n_gt50,
           CAST(COUNT(CASE WHEN json_extract(props, '$.missing') IS NULL
                           THEN 1 END) AS BIGINT) AS n_null_path
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tables=("events",),
)


# Spark 4 VARIANT type: parse the JSON once into the binary semi-structured
# type, then typed-path extraction (variant_get) — the shred-once /
# extract-many shape for semi-structured columns at scale (vs re-parsing
# the string per path as get_json_object does). DuckDB twin uses its JSON
# type the same way.
pair(
    "expr_variant",
    """
    WITH v AS (SELECT event_id, event_type, PARSE_JSON(props) AS pv FROM events)
    SELECT event_type,
           CAST(SUM(CAST(VARIANT_GET(pv, '$.k', 'bigint') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(MAX(CAST(VARIANT_GET(pv, '$.k', 'bigint') AS BIGINT)) AS BIGINT)
               AS max_k,
           CAST(COUNT(CASE WHEN VARIANT_GET(pv, '$.absent', 'string') IS NULL
                           THEN 1 END) AS BIGINT) AS n_null_path
    FROM v
    GROUP BY event_type
    ORDER BY event_type
    """,
    """
    WITH v AS (SELECT event_id, event_type, props::JSON AS pv FROM events)
    SELECT event_type,
           CAST(SUM(CAST(json_extract(pv, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract(pv, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(COUNT(CASE WHEN json_extract_string(pv, '$.absent') IS NULL
                           THEN 1 END) AS BIGINT) AS n_null_path
    FROM v
    GROUP BY event_type
    ORDER BY event_type
    """,
    tables=("events",),
)

# Spark 4 string collations: case-insensitive compare/group via the
# UTF8_LCASE collation (DuckDB spells it COLLATE NOCASE). Collation-aware
# equality pushes into hash aggregates/joins JVM-side — no LOWER() copies
# of the column needed.
pair(
    "expr_collation",
    """
    SELECT COLLATE(c_mktsegment, 'UTF8_LCASE') AS seg_ci,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN COLLATE(c_mktsegment, 'UTF8_LCASE') = 'building'
                           THEN 1 END) AS BIGINT) AS n_building_ci
    FROM customer
    GROUP BY COLLATE(c_mktsegment, 'UTF8_LCASE')
    ORDER BY seg_ci
    """,
    """
    SELECT c_mktsegment COLLATE NOCASE AS seg_ci,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN c_mktsegment COLLATE NOCASE = 'building'
                           THEN 1 END) AS BIGINT) AS n_building_ci
    FROM customer
    GROUP BY c_mktsegment COLLATE NOCASE
    ORDER BY seg_ci
    """,
    tables=("customer",),
)


# Bit shifts — Spark spells them SHIFTLEFT/SHIFTRIGHT, DuckDB << / >>.
# Full unique ORDER BY tiebreak: (l_orderkey, l_linenumber) repeats in the
# synthetic fixtures, and a tie at the LIMIT boundary flips rows.
pair(
    "expr_bit_shift",
    """
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(SHIFTLEFT(l_partkey, 3) AS BIGINT)  AS shl,
           CAST(SHIFTRIGHT(l_partkey, 2) AS BIGINT) AS shr
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 30
    """,
    """
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(l_partkey << 3 AS BIGINT) AS shl,
           CAST(l_partkey >> 2 AS BIGINT) AS shr
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey LIMIT 30
    """,
    tables=("lineitem",),
)

# SPLIT_PART — same name and 1-based semantics in both dialects.
twin(
    "expr_split_part",
    """
    SELECT c_custkey,
           SPLIT_PART(c_name, '#', 1) AS name_head,
           SPLIT_PART(c_name, '#', 2) AS name_num
    FROM customer ORDER BY c_custkey LIMIT 30
    """,
    tables=("customer",),
)

# COUNT_IF — same name both dialects (sugar for COUNT(CASE WHEN...)).
twin(
    "agg_count_if",
    """
    SELECT o_orderstatus,
           CAST(COUNT_IF(o_totalprice > 100000) AS BIGINT)       AS n_big,
           CAST(COUNT_IF(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tables=("orders",),
)

# Datetime formatting — Spark's JDK patterns vs DuckDB's strftime.
pair(
    "expr_date_format",
    """
    SELECT o_orderkey,
           DATE_FORMAT(o_orderdate, 'yyyy-MM')    AS ym,
           DATE_FORMAT(o_orderdate, 'yyyy/MM/dd') AS ymd
    FROM orders ORDER BY o_orderkey LIMIT 30
    """,
    """
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m')    AS ym,
           STRFTIME(o_orderdate, '%Y/%m/%d') AS ymd
    FROM orders ORDER BY o_orderkey LIMIT 30
    """,
    tables=("orders",),
)


# Regex group extraction — same name/semantics both dialects.
twin(
    "expr_regexp_extract",
    """
    SELECT c_custkey,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1)       AS digits,
           REGEXP_EXTRACT(c_mktsegment, '^([A-Z]+)', 1) AS seg_head
    FROM customer ORDER BY c_custkey LIMIT 30
    """,
    tables=("customer",),
)

# Array set algebra — Spark ARRAY_INTERSECT/EXCEPT/DISTINCT implicitly
# dedup; the oracle mirrors that with LIST_DISTINCT-wrapped list ops.
pair(
    "expr_array_setops",
    """
    WITH t AS (
        SELECT doc_id,
               SLICE(SPLIT(LOWER(TRIM(text)), ' '), 1, 6)  AS a,
               SLICE(SPLIT(LOWER(TRIM(text)), ' '), 4, 6)  AS b
        FROM documents
    )
    SELECT doc_id,
           ARRAY_JOIN(ARRAY_SORT(ARRAY_INTERSECT(a, b)), '|') AS inter,
           ARRAY_JOIN(ARRAY_SORT(ARRAY_EXCEPT(a, b)), '|')    AS minus,
           ARRAY_JOIN(ARRAY_SORT(ARRAY_DISTINCT(a)), '|')     AS dedup
    FROM t ORDER BY doc_id LIMIT 30
    """,
    """
    WITH t AS (
        SELECT doc_id,
               string_split(LOWER(TRIM(text)), ' ')[1:6]  AS a,
               string_split(LOWER(TRIM(text)), ' ')[4:9]  AS b
        FROM documents
    )
    SELECT doc_id,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_INTERSECT(a, b))), '|') AS inter,
           ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(LIST_DISTINCT(a),
                                                 x -> NOT LIST_CONTAINS(b, x))), '|')
               AS minus,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(a)), '|') AS dedup
    FROM t ORDER BY doc_id LIMIT 30
    """,
    tables=("documents",),
)


@register(
    "expr_url_parse",
    oracle=r"""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/' || lang || '/doc/'
                   || doc_id || '?q=' || n_chars || '&lang=' || lang || '#s'
                   || (doc_id % 5) AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)', 1)      AS host,
           regexp_extract(url, '^https://[^/]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\?([^#]*)', 1)              AS query,
           regexp_extract(url, '[?&]q=([^&#]*)', 1)         AS q_param,
           regexp_extract(url, '#(.*)$', 1)                 AS fragment
    FROM u ORDER BY doc_id
    """,
)
def expr_url_parse(spark, sf_dir):
    """URL component extraction (Spark's parse_url — HOST/PATH/QUERY/
    query-parameter/REF), the first step of every web-corpus pipeline
    (domain blocklists, per-site caps, dedup by canonical URL). URLs are
    constructed deterministically from the fixture columns so the DuckDB
    oracle can verify via regexes what Spark extracts via its dedicated
    parser — the values must agree exactly. Pure codegen projection, no
    shuffle beyond the output sort."""
    from blazingsql_spark.queries.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?q="), F.col("n_chars").cast("string"),
        F.lit("&lang="), F.col("lang"),
        F.lit("#s"), (F.col("doc_id") % 5).cast("string"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    ).orderBy("doc_id")


@register(
    "dedup_url_canonical",
    oracle=r"""
    WITH u AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END
               || CASE WHEN doc_id % 3 = 0 THEN UPPER(source) ELSE source END
               || '.Example.COM'
               || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
               || '/doc/' || (doc_id % 40)
               || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
               || CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '?a=1&b=2' END
               || CASE WHEN doc_id % 11 = 0 THEN '#frag' ELSE '' END AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id,
               LOWER(regexp_extract(url, '(?i)^(https?)://', 1))
               || '://'
               || LOWER(regexp_replace(regexp_extract(url, '(?i)^https?://([^/?#]+)', 1),
                                       ':443$|:80$', ''))
               || regexp_replace(regexp_extract(url, '(?i)^https?://[^/?#]+([^?#]*)', 1),
                                 '/$', '')
               || '?' || array_to_string(
                      list_sort(string_split(
                          regexp_extract(url, '\?([^#]*)', 1), '&')), '&')
                   AS canonical
        FROM u
    )
    SELECT canonical,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc
    FROM canon
    GROUP BY canonical
    HAVING COUNT(*) > 1
    ORDER BY canonical
    """,
)
def dedup_url_canonical(spark, sf_dir):
    """URL canonicalization dedup — the web-crawl staple that exact text
    dedup misses: scheme/host case, default :443/:80 ports, trailing
    slashes, fragments, and query-parameter ORDER all vary across crawls
    of the same page. Messy URL variants are constructed deterministically
    from the fixture columns, canonicalized with pure codegen expressions
    (lowercase scheme+host, strip default port, strip trailing slash,
    drop fragment, sort query params via array_sort — no UDF), and
    grouped: rows sharing a canonical form are the duplicate clusters,
    keep_doc = the id-canonical survivor. One partial-agg shuffle on the
    canonical hash; at 100 TB this is the same md5-groupBy shape as
    dedup_exact with a normalization in front."""
    from blazingsql_spark.queries.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(F.col("doc_id") % 3 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/doc/"), (F.col("doc_id") % 40).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("?a=1&b=2")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    u = docs.select("doc_id", url.alias("url"))
    canonical = F.concat(
        F.lower(F.regexp_extract("url", r"(?i)^(https?)://", 1)),
        F.lit("://"),
        F.regexp_replace(
            F.lower(F.regexp_extract("url", r"(?i)^https?://([^/?#]+)", 1)),
            r":443$|:80$", "",
        ),
        F.regexp_replace(
            F.regexp_extract("url", r"(?i)^https?://[^/?#]+([^?#]*)", 1), r"/$", ""
        ),
        F.lit("?"),
        F.array_join(
            F.array_sort(F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&")), "&"
        ),
    )
    return (
        u.select("doc_id", canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("doc_id").cast("long").alias("keep_doc"),
        )
        .filter(F.col("n_dups") > 1)
        .orderBy("canonical")
    )


@register(
    "expr_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                ELSE CAST(o_custkey AS BIGINT) // (o_orderkey % 10) END
               AS safe_div,
           CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                ELSE CAST(9223372036854775807 AS BIGINT) END AS big_or_null,
           CAST(o_custkey + o_orderkey AS BIGINT) AS safe_add
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def expr_try_arithmetic(spark, sf_dir):
    """Error-safe arithmetic (try_divide/try_add + a guarded overflow
    case): ANSI-mode Spark turns division-by-zero and overflow into
    runtime errors, and the try_* family is the per-expression escape
    hatch a batch pipeline needs (one poisoned row must not kill a 100 TB
    aggregation). DuckDB has no try_divide, so the oracle spells the same
    semantics with CASE guards — values must agree exactly, nulls where
    the error would have been."""
    from blazingsql_spark.queries.registry import load_table

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.floor(
            F.try_divide(F.col("o_custkey").cast("bigint"), F.col("o_orderkey") % 10)
        ).cast("long").alias("safe_div"),
        F.when(
            F.col("o_orderkey") % 1000 == 0, F.try_add(F.lit(2**63 - 1).cast("long"), F.lit(1))
        ).otherwise(F.lit(2**63 - 1)).alias("big_or_null"),
        F.try_add(F.col("o_custkey"), F.col("o_orderkey")).cast("long").alias("safe_add"),
    ).orderBy("o_orderkey")


@register(
    "url_domain_blocklist",
    oracle="""
    WITH u AS (
        SELECT doc_id, lang || '.' || source || '.example.com' AS host
        FROM documents
    ),
    bl(domain) AS (
        VALUES ('src3.example.com'), ('en.src7.example.com'), ('example.net')
    ),
    blocked AS (
        SELECT DISTINCT u.doc_id FROM u JOIN bl
            ON u.host = bl.domain OR u.host LIKE '%.' || bl.domain
    )
    SELECT u.doc_id, u.host FROM u
    WHERE u.doc_id NOT IN (SELECT doc_id FROM blocked)
    ORDER BY u.doc_id
    """,
)
def url_domain_blocklist(spark, sf_dir):
    """Domain blocklist with SUBDOMAIN semantics (functions.web
    .blocklist_filter): hosts explode into their dot-suffixes and match
    the list via ONE equi-join — never the quadratic LIKE-against-every-
    domain cross join (the oracle deliberately uses that naive spelling:
    same semantics, fixture-scale only). The fixture blocklist exercises
    all three cases: a registrable domain that blocks every subdomain
    (src3.example.com catches all five language hosts), an exact deep
    host (en.src7.example.com leaves src7's other languages alone), and
    a miss (example.net)."""
    from blazingsql_spark.functions.web import blocklist_filter
    from blazingsql_spark.queries.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.col("lang"), F.lit("."), F.col("source"), F.lit(".example.com")
        ).alias("host"),
    )
    bl = spark.createDataFrame(
        [("src3.example.com",), ("en.src7.example.com",), ("example.net",)],
        ["domain"],
    )
    return blocklist_filter(u, bl).select("doc_id", "host").orderBy("doc_id")
