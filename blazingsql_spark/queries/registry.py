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
    "blazingsql_spark.queries.tpch_extra",
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
        # events.ts resolution varies across fixture regenerations (NANOS in
        # rounds 1-2, MICROS since round 3) — under nanosAsLong a NANOS file
        # surfaces ts as bigint (truncate to µs, identical to DuckDB's
        # TIMESTAMP_NS→TIMESTAMP cast); a MICROS file reads as timestamp
        # directly. Probe the dtype, never assume.
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
# registry in iteration order. Round-3 rotation (per VERDICT r2 worklist):
# (a) the 18 round-2-registered queries with no driver row yet, (b) the
# four tpch_extra queries newly given inline-partsupp oracles, (c) three
# sentinels — the two round-2 red rows (cast fixes to confirm green) plus
# tpch_q1 as the standing regression canary, (d) back-fill with the
# round-1-green TPC-H/join block that round 2 rotated OUT of the window,
# so both registry halves get re-verified within two rounds (ROADMAP
# alternating plan). Everything else follows in registration order.
DRIVER_PRIORITY = (
    # (c) sentinels FIRST — the two round-2 red rows (cast fixes that must
    # show green in CORRECTNESS_r03) + the standing tpch_q1 canary; they
    # must never fall off the end of the ~50-row driver window
    "expr_math",
    "text_stats",
    "tpch_q1",
    # (a) no driver row yet — round-2 additions
    "agg_approx_percentile",
    "docs_pack",
    "docs_chunk",
    "split_assign",
    "sample_stratified",
    "sample_weighted",
    "shard_assign",
    "text_redact",
    "text_repetition",
    "text_stopwords",
    "vocab_topk",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "pipeline_prepare_corpus",
    "dedup_contamination",
    "profile_lineitem",
    "events_trending",
    "events_hopping_window",
    "window_range_time",
    "sample_domain_mix",
    "emb_label_centroids",
    "knn_classify",
    # (b) full-22 TPC-H parity: inline-generated partsupp twins
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q20",
    # (b2) round-3-added subquery suite (Catalyst decorrelation paths)
    "subquery_in",
    "subquery_not_in",
    "subquery_exists",
    "subquery_not_exists",
    "subquery_scalar",
    "subquery_correlated_scalar",
    # (b3) round-3 SQL-surface additions
    "limit_offset",
    "agg_having",
    "agg_percentile_cont",
    "expr_array",
    "agg_filter_clause",
    "window_ignore_nulls",
    "agg_salted_skew",
    "text_boilerplate",
    "multimodal_frames",
    "agg_corr_covar",
    "agg_regression",
    "expr_string_pad",
    "expr_map",
    "unpivot_metrics",
    "events_funnel",
    "events_retention",
    "window_ratio_to_report",
    "agg_grouping_fn",
    "intersect_all",
    "except_distinct",
    "expr_try_cast",
    "expr_greatest_least",
    "text_perplexity",
    "dedup_components",
    "events_gapfill",
    "events_anomaly",
    "expr_like_wildcards",
    # (d) round-1-green block rotating back in
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q21",
    "tpch_q22",
    "join_inner",
    "join_left",
    "join_right",
    "join_full_outer",
    "join_cross",
    "join_semi",
    "join_anti",
    "join_nullsafe",
    "join_nonequi",
    "join_theta",
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
