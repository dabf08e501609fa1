"""Graph operators for dedup canonicalization.

Near-dup detection emits PAIRS (a ≈ b); turning pairs into keep/drop
decisions needs the transitive closure — a≈b≈c must collapse to ONE
canonical doc even when a≉c directly. That is connected components over
the similarity graph, the standard last step of a dedup pipeline
(each component keeps its min-id member).

``connected_components`` is iterative min-label propagation: every node
repeatedly adopts the smallest label among itself and its neighbors;
convergence in O(component diameter) rounds. Each round is one equi-join +
one partial-aggregated groupBy(min) — no sorts — with the label table
localCheckpoint'ed per round (same O(iter) lineage discipline as the
k-means loops in functions.similarity). Production note: for graphs with
huge diameters the two-phase star-contraction variant (alternating
large-star/small-star, Kiveris et al., "Connected Components in MapReduce
and Beyond") halves round counts; near-dup similarity graphs are
low-diameter clumps, where plain propagation is already optimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 100,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``edges``, where
    component_id is the smallest node id reachable from it. Deterministic;
    converges early when no label changes (the convergence probe is a
    bounded limit(1).count per round, not a data collect).

    Convergence needs O(longest decreasing-local-minima chain) rounds.
    The cap is a safety valve, not an answer-shaper: if the loop has not
    converged when it runs out, this RAISES rather than silently
    returning non-minimal labels (the sf0.1 full-registry gate caught
    exactly that: the measured canonicalization graph needs ~60 plain
    rounds, and a silent 25-round cap produced one wrong survivor).

    Why NOT pointer-doubling (lab = lab(lab(node))): measured, not
    hypothetical — ``localCheckpoint`` truncates RDD lineage but NOT the
    LOGICAL plan, so a per-round self-join makes Catalyst's sizeInBytes
    estimate SQUARE each round; its BigInteger digit count doubles
    per iteration and by round ~16 the stats visitor grinds
    million-digit multiplications on the driver (observed: single
    planning thread pinned for 10+ minutes). Plain propagation keeps the
    size exponent growing linearly (a few hundred digits over 100
    rounds — negligible). The loop-plan-size discipline every iterative
    operator here follows (k-means, PageRank) is: reference the previous
    round's table ONCE per round. For adversarially deep graphs the
    large-star/small-star EDGE contraction (Kiveris et al.) gives
    O(log n) rounds without self-joining the label table; near-dup
    similarity graphs in practice are low-diameter clumps."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neigh = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("lab")
        )
        new_labels = (
            labels.select("node", "lab")
            .union(neigh)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        sym.unpersist()
        raise RuntimeError(
            f"connected_components: not converged after {max_iterations} "
            "rounds — raise max_iterations (labels would be non-minimal)"
        )
    sym.unpersist()
    return labels.select("node", F.col("lab").alias("component_id"))


def canonical_docs(
    pairs: DataFrame,
    all_docs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Keep-set after transitive dedup: every document maps to its
    component's min id (itself, if it appears in no near-dup pair); keep
    rows where doc_id == canonical_id."""
    comp = connected_components(pairs, pair_a, pair_b)
    with_comp = all_docs.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    ).withColumn("canonical_id", F.coalesce(F.col("component_id"), F.col(id_col)))
    return with_comp.filter(F.col(id_col) == F.col("canonical_id")).drop(
        "component_id", "canonical_id"
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
) -> DataFrame:
    """(node, rank) after a FIXED number of power iterations with uniform
    teleport — rank-based importance over a link/similarity graph (e.g.
    weighting crawl documents by citation structure before sampling).

    Fixed iteration count keeps the result deterministic and
    SQL-oracle-able (the oracle unrolls the same iterations). Each round
    is one equi-join (contributions along edges) + one partial-aggregated
    groupBy sum, localCheckpoint'ed — the same O(iter) lineage discipline
    as ``connected_components`` and the k-means loops. Dangling mass is
    NOT redistributed (nodes without out-edges leak rank), matching the
    simple unrolled oracle; at web scale add the standard dangling-sum
    correction term per round.

    Float portability: the damping/teleport constants enter as plain
    literals (never derived arithmetically, e.g. 1-d), so both engines
    evaluate the identical doubles.
    """
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        sym.select(F.col("s").alias("node"))
        .union(sym.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded driver scalar (a count, not data)
    # literals, not arithmetic: (1-0.85) in Python is 0.1499999...; the
    # SQL oracle's 0.15 parses to the nearest double OF THE DECIMAL — so
    # round the complement back through its decimal representation
    one_minus_d = float(str(round(1.0 - damping, 10)))
    teleport = one_minus_d / n
    outdeg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            sym.join(ranks, sym["s"] == ranks["node"])
            .join(F.broadcast(outdeg), "s")
            .select(F.col("d").alias("node"), (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("csum"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    return ranks
