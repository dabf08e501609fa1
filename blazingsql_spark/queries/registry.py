"""Central query registry: every operator we claim in SURVEY.md §2 has one
entry here — a Spark implementation plus (where SQL-expressible) a DuckDB
oracle SQL string. The driver and tests/bench all consume this registry, so
an operator is "done" exactly when it appears here and matches its oracle.

Determinism rules (so value-hashes match across engines):
- double aggregates are ROUND()ed (2-6 decimals) in BOTH dialects — floating
  sums are order-dependent across engines, rounding removes the low bits;
- every computed column is aliased identically in both dialects;
- LIMIT queries carry a total ORDER BY with a unique tiebreaker;
- no engine-specific functions in compared output (e.g. hash()).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Modules that populate the registry on import.
_QUERY_MODULES = (
    "blazingsql_spark.queries.tpch",
    "blazingsql_spark.queries.relational",
    "blazingsql_spark.queries.expressions",
    "blazingsql_spark.queries.pipeline",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def _add(spec: QuerySpec) -> None:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec


def register(name: str, oracle: str | None = None, headline: bool = False, doc: str = ""):
    """Decorator for DataFrame-API query implementations."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _add(QuerySpec(name, fn, oracle, headline, doc or (fn.__doc__ or "")))
        return fn

    return deco


def _prepare_session(spark: SparkSession) -> None:
    """Confs the queries depend on, set defensively: the driver may hand us
    a session built without blazingsql_spark.session.get_spark (e.g. its own
    harness session). Both are runtime-settable."""
    try:
        # UTC so timestamp extraction/windows match the (UTC-naive) oracle
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _prepare_session(spark)
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanosecond
        # timestamp; read as long and truncate to microseconds (identical to
        # DuckDB's TIMESTAMP_NS→TIMESTAMP cast, so oracles stay comparable).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ensure_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register the testdata tables as temp views for SQL-form queries."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _sql_fn(sql: str, tables: tuple[str, ...]) -> Callable[[SparkSession, str], DataFrame]:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir, tables)
        return spark.sql(sql)

    fn.sql = sql  # type: ignore[attr-defined]
    return fn


def twin(
    name: str,
    sql: str,
    tables: tuple[str, ...] = TABLES,
    headline: bool = False,
    doc: str = "",
) -> None:
    """Register a query whose Spark SQL and DuckDB oracle are the SAME text —
    the common case: both engines speak ANSI SQL."""
    _add(QuerySpec(name, _sql_fn(sql, tables), sql, headline, doc))


def pair(
    name: str,
    spark_sql: str,
    oracle: str | None,
    tables: tuple[str, ...] = TABLES,
    headline: bool = False,
    doc: str = "",
) -> None:
    """Register a query with dialect-divergent Spark SQL vs DuckDB SQL."""
    _add(QuerySpec(name, _sql_fn(spark_sql, tables), oracle, headline, doc))


_loaded = False

# The driver records correctness rows for a bounded prefix (~50) of the
# registry in iteration order. Round 1 verified the first 50 registered
# queries (all green, CORRECTNESS_r01.json); this list front-loads the
# queries that still need a driver row — the 47 round-1-unchecked ones plus
# agg_approx_distinct (no_oracle err, since fixed) and tpch_q14 (vacuous
# hash-match bug, since fixed) — with tpch_q1 as a regression sentinel.
# Everything else (round-1 green) follows in registration order.
DRIVER_PRIORITY = (
    "orderby_nulls",
    "union_all",
    "union_distinct",
    "intersect",
    "except_all",
    "union_type_coerce",
    "agg_with_nulls",
    "distinct_with_nulls",
    "join_null_keys_dropped",
    "window_nth_value",
    "events_tumbling_window",
    "events_sessionize",
    "events_json_extract",
    "pivot_status",
    "asof_join_events",
    "range_join_orders",
    "topk_per_group",
    "expr_predicates",
    "expr_math",
    "expr_string",
    "expr_datetime",
    "expr_extract",
    "expr_case",
    "expr_cast",
    "expr_bitwise",
    "expr_interval",
    "expr_is_truth",
    "expr_to_timestamp",
    "expr_rand",
    "expr_literals",
    "text_stats",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_winnowing",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_near_dup",
    "sim_ann_ivf",
    "multimodal_meta",
    "multimodal_decode",
    "multimodal_resize",
    "nested_struct_ops",
    "agg_approx_distinct",
    "tpch_q14",
    "tpch_q1",
)


def all_queries() -> dict[str, QuerySpec]:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True
    ordered: dict[str, QuerySpec] = {}
    for name in DRIVER_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
