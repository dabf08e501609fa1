"""sim_ann_hnsw — recall-gated registry row for the HNSW graph ANN tier
(operators.hnsw), completing the ANN family list (LSH / IVF / PQ / IVF-PQ
/ graph).

Same oracle shape as sim_ann_ivfpq: the graph/codebook contents aren't
SQL-expressible, but recall@5 vs the exact top-k is deterministic
end-to-end (seeded level RNG, id tiebreaks everywhere, md5-seeded k-means
landmarks) so the driver-comparable output is a thresholded boolean the
DuckDB oracle asserts TRUE. ef is set >= n_centroids, which makes the
coarse probe EXACT (tests/test_hnsw.py proves row-for-row equality with
ivf_topk then), so measured recall here equals the IVF tier's .64-.84 —
threshold 0.6 holds with the same margin.

STAGED for round 6: not in registry._QUERY_MODULES until the round-5
window freeze lifts (same staging discipline as queries/formats.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blazingsql_spark.functions import similarity
from blazingsql_spark.operators import hnsw
from blazingsql_spark.queries.pipeline import _recall_gate
from blazingsql_spark.queries.registry import load_table, register


def _hnsw_index(spark, sf_dir: str, emb):
    """Session-scoped resident index: centroids + assignment lists
    (persisted) + the landmark graph, built once per (app, sf_dir) so
    bench repeats measure the probe path — the same amortization
    discipline as pipeline._ivfpq_index, and the same dict so bench.py's
    inter-query cleanup drops both together. Deterministic: a fresh
    session rebuilds the identical index (md5-seeded k-means, seeded
    level RNG)."""
    from blazingsql_spark.queries.pipeline import _IVFPQ_PREBUILT

    key = (spark.sparkContext.applicationId, sf_dir, "hnsw_ivf")
    if key not in _IVFPQ_PREBUILT:
        cents = similarity.ivf_train_centroids(emb, k=16, dim=64)
        lists = similarity.assign_to_centroids(emb, cents, "vec_id", "embedding")
        lists = lists.persist()
        lists.count()  # materialize the assignment now
        graph = hnsw.graph_from_centroids(cents, m=8, ef_construction=64)
        _IVFPQ_PREBUILT[key] = (cents, lists, graph)
    return _IVFPQ_PREBUILT[key]


@register(
    "sim_ann_hnsw",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(COUNT(*) * 5 AS BIGINT) AS n_exact_results,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id % 100 = 0
    """,
    headline=True,  # benched from r6 (bench.py reports common22 w/o it)
)
def sim_ann_hnsw(spark, sf_dir):
    """HNSW graph ANN (operators.hnsw.hnsw_ivf_topk): driver-built graph
    over the k-means landmark table routes each query to its n_probe
    cells in O(ef·M·dim·log N) instead of the O(N·dim) broadcast scan;
    candidate retrieval stays the IVF equi-join. Deterministic; recall@5
    vs brute force as a thresholded boolean the oracle asserts TRUE."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents, lists, graph = _hnsw_index(spark, sf_dir, emb)
    exact = similarity.cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    approx = (
        hnsw.hnsw_ivf_topk(
            emb, queries, k=5, n_centroids=16, ef=64,
            prebuilt=graph, prebuilt_ivf=(cents, lists),
        )
        .select("query_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    return _recall_gate(exact, approx, threshold=0.8)


@register(
    "events_match_recognize",
    oracle="""
    WITH coded AS (
        SELECT user_id, ts, event_id,
               CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' ELSE 's' END AS code
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
           CAST(list_max(list_transform(ms, x -> LENGTH(x))) AS BIGINT)
               AS longest_match
    FROM m WHERE LEN(ms) > 0 ORDER BY user_id
    """,
    doc="SQL:2016 MATCH_RECOGNIZE spelling (operators/match_recognize.py "
    "+ the Context.sql rewriter) over the funnel pattern V C+ P; "
    "one-row-per-match output re-aggregated per user so the DuckDB twin "
    "can replay it as the regexp over per-user code strings — the same "
    "oracle scheme as events_pattern_match, restricted to users with "
    "at least one match (ONE ROW PER MATCH emits nothing otherwise)",
)
def events_match_recognize(spark, sf_dir):
    """Drives the row-pattern query through the SQL SPELLING (the
    Context.sql rewrite path), not the Python operator API, so the row
    checks exactly what a migrating user would type. The reference has
    no row-pattern surface at all (no SQL:2016 §R in its Calcite fork);
    beyond-reference."""
    from blazingsql_spark.context import Context
    from blazingsql_spark.queries.registry import ensure_views

    ensure_views(spark, sf_dir, ("events",))
    bc = Context(spark=spark)
    return bc.sql(
        """
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_matches,
               CAST(MAX(match_len) AS BIGINT) AS longest_match
        FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(*) AS match_len
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (V C+ P)
            DEFINE V AS event_type = 'view',
                   C AS event_type = 'click',
                   P AS event_type = 'purchase'
        )
        GROUP BY user_id
        ORDER BY user_id
        """
    )
