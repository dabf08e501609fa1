"""dedup_components_incremental — driver-checkable row for per-batch
label maintenance (operators.graph.incremental_components).

The query builds the SAME chained-blocks graph as dedup_components but
feeds the edges in THREE interleaved batches (doc_id % 3 round-robin),
maintaining labels incrementally: components only reach their final
shape after cross-batch merges, so any bookkeeping error in the
old-label remap shows up as a value mismatch against the DuckDB
recursive-CTE oracle (which, by the incremental-equals-full theorem the
unit tests assert, is the same oracle dedup_components uses).

STAGED for round 7: r6's 50-row window is already budgeted
(registry.py); this joins `_QUERY_MODULES` with the r7 rotation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blazingsql_spark.queries.registry import load_table, register


@register(
    "dedup_components_incremental",
    oracle="""
    WITH RECURSIVE e AS (
        SELECT doc_id AS a, doc_id + 1 AS b FROM documents
        WHERE doc_id % 7 <> 6
          AND doc_id + 1 <= (SELECT MAX(doc_id) FROM documents)
    ),
    sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
    nodes AS (SELECT DISTINCT a AS node FROM sym),
    reach AS (
        SELECT node, node AS lab FROM nodes
        UNION
        SELECT s.b AS node, r.lab FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT node AS doc_id, MIN(lab) AS component_id
    FROM reach GROUP BY node ORDER BY doc_id
    """,
)
def dedup_components_incremental(spark, sf_dir):
    """Per-batch component maintenance must land on the same labels as a
    one-shot CC over all edges: three round-robin edge batches, each
    applied with incremental_components against the labels so far."""
    from blazingsql_spark.operators.graph import incremental_components

    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    edges = docs.filter(
        (F.col("doc_id") % 7 != 6) & (F.col("doc_id") + 1 <= max_id)
    ).select(F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst"))
    labels = None
    for i in range(3):
        batch = edges.filter(F.col("src") % 3 == i)
        labels = incremental_components(labels, batch).localCheckpoint(eager=True)
    return (
        labels.select(F.col("node").alias("doc_id"), "component_id")
        .orderBy("doc_id")
    )
