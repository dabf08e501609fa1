"""HNSW graph ANN (operators.hnsw): numpy-core exactness at full ef,
Spark differential equivalence against the brute-force IVF probe, and
recall on the embeddings table — the same test strategy as the other ANN
tiers (ivf/pq/ivfpq)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from blazingsql_spark.operators import hnsw
from blazingsql_spark.queries.registry import load_table
from tests.conftest import SF_DIR as SF


def _brute_topk(pts: np.ndarray, q: np.ndarray, k: int) -> list[int]:
    p = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
    qn = q / max(np.linalg.norm(q), 1e-12)
    sims = p @ qn
    order = sorted(range(len(sims)), key=lambda i: (-sims[i], i))
    return order[:k]


def test_hnsw_exact_at_full_ef():
    """ef >= n degenerates layer-0 search to exhaustive scan: results must
    equal brute force EXACTLY (same similarity order, same id tiebreak)
    for every query — this is the property that makes the Spark
    differential test below meaningful."""
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(200, 16)).astype(np.float32)
    g = hnsw.build_hnsw(pts, m=6, ef_construction=40)
    for qi in range(20):
        q = rng.normal(size=16).astype(np.float32)
        assert hnsw.hnsw_search(g, q, k=10, ef=200) == _brute_topk(pts, q, 10)


def test_hnsw_recall_at_moderate_ef():
    """The usual ANN contract: small ef loses some neighbors but recall
    stays high; self-queries always find themselves at rank 1."""
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(500, 32)).astype(np.float32)
    g = hnsw.build_hnsw(pts, m=8, ef_construction=64)
    hits = total = 0
    for qi in range(0, 500, 25):
        got = hnsw.hnsw_search(g, pts[qi], k=10, ef=48)
        assert got[0] == qi  # self-match first
        want = _brute_topk(pts, pts[qi], 10)
        hits += len(set(got) & set(want))
        total += 10
    assert hits / total >= 0.8, hits / total


def test_hnsw_deterministic_build():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(100, 8)).astype(np.float32)
    g1 = hnsw.build_hnsw(pts, m=4, ef_construction=16, seed=9)
    g2 = hnsw.build_hnsw(pts, m=4, ef_construction=16, seed=9)
    assert g1.entry == g2.entry and (g1.levels == g2.levels).all()
    assert g1.layers == g2.layers


def test_hnsw_probe_matches_bruteforce_probe_spark(spark):
    """Differential: with ef >= n_centroids the HNSW coarse probe is
    exact, so hnsw_ivf_topk must equal similarity.ivf_topk ROW-FOR-ROW
    (same centroids, same probes, same rerank, same tiebreaks)."""
    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    via_scan = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4)
    via_graph = hnsw.hnsw_ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=4, ef=64
    )
    a = sorted(map(tuple, via_scan.collect()))
    b = sorted(map(tuple, via_graph.collect()))
    assert a == b and len(a) > 0


def test_hnsw_ivf_recall_vs_bruteforce(spark):
    """Same recall gate as the other ANN tiers: all self-matches found,
    recall vs exact cosine top-k above the floor."""
    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=5)
    approx = hnsw.hnsw_ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4, ef=16)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    for qid in {q for q, _ in exact_set}:
        assert (qid, qid) in approx_set
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, recall


def test_hnsw_plan_no_cartesian(spark):
    """The candidate retrieval must stay an equi-join on centroid_id —
    no BroadcastNestedLoopJoin / CartesianProduct anywhere in the plan."""
    from tests.test_plans import join_strategies

    emb = load_table(spark, SF, "embeddings")
    queries = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    out = hnsw.hnsw_ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=2)
    strategies = join_strategies(out)
    assert "CartesianProduct" not in strategies
    # the one BNLJ is assign_to_centroids' corpus x broadcast(1-row
    # collected-centroid-array) — the same bounded shape the registry
    # sweep allows for sim_ann_ivf; the candidate retrieval itself must
    # be a hash equi-join
    assert strategies.get("BroadcastNestedLoopJoin", 0) <= 1
    assert strategies.get("BroadcastHashJoin", 0) >= 1


def test_hnsw_empty_and_tiny_inputs():
    with pytest.raises(ValueError):
        hnsw.build_hnsw(np.zeros((0, 4), dtype=np.float32))
    g = hnsw.build_hnsw(np.ones((1, 4), dtype=np.float32), m=4)
    assert hnsw.hnsw_search(g, np.ones(4), k=3, ef=8) == [0]


def test_hnsw_index_save_load_roundtrip(spark, tmp_path):
    """Persisted graph (parquet nodes+edges, same storage plane as the
    other ANN artifacts) must search identically to the in-memory one."""
    from blazingsql_spark.functions.similarity import ivf_train_centroids

    emb = load_table(spark, SF, "embeddings")
    cents = ivf_train_centroids(emb, k=8)
    graph, cids = hnsw.graph_from_centroids(cents, m=4, ef_construction=32)
    hnsw.save_hnsw_index(spark, str(tmp_path / "g"), graph, cids)
    g2, cids2 = hnsw.load_hnsw_index(spark, str(tmp_path / "g"))
    assert (cids == cids2).all() and g2.entry == graph.entry
    assert (g2.levels == graph.levels).all()
    rng = np.random.default_rng(5)
    for _ in range(10):
        q = rng.normal(size=graph.points.shape[1]).astype(np.float32)
        assert hnsw.hnsw_search(g2, q, k=4, ef=16) == hnsw.hnsw_search(graph, q, k=4, ef=16)
    # and the prebuilt path produces the same Spark result as fresh build
    queries = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, hnsw.hnsw_coarse_probes(queries, cents, n_probe=3, ef=32).collect()))
    b = sorted(map(tuple, hnsw.hnsw_coarse_probes(queries, cents, n_probe=3, ef=32, prebuilt=(g2, cids2)).collect()))
    assert a == b and len(a) > 0


def test_sim_ann_hnsw_staged_oracle(spark, oracle):
    """The r6-staged registry row (queries/graph_ann.py): full
    driver-faithful compare must pass now so the r6 flip is risk-free."""
    import blazingsql_spark.queries.graph_ann  # noqa: F401  (self-registers)

    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle, "sim_ann_hnsw")


def test_hnsw_duplicate_points_and_small_n():
    """All-identical points (total ties everywhere) and k > n must stay
    deterministic: ties resolve to smaller ids, k truncates to n."""
    pts = np.ones((5, 8), dtype=np.float32)
    g = hnsw.build_hnsw(pts, m=4, ef_construction=8)
    got = hnsw.hnsw_search(g, np.ones(8, dtype=np.float32), k=10, ef=16)
    assert sorted(got) == [0, 1, 2, 3, 4]
    assert got == [0, 1, 2, 3, 4]  # ties ordered by id
    # zero-vector query: normalizes to zeros, similarity ties at 0 -> ids
    got0 = hnsw.hnsw_search(g, np.zeros(8, dtype=np.float32), k=3, ef=8)
    assert got0 == [0, 1, 2]


def test_hnsw_save_load_preserves_adjacency_order(spark, tmp_path):
    """Neighbor-list ORDER must round-trip (the edges table carries pos):
    _search_layer admission at a full heap is order-sensitive on
    similarity ties, so a sorted reload could search differently on
    degenerate (duplicate-vector) landmark tables."""
    pts = np.concatenate([np.ones((6, 4)), np.full((6, 4), 0.5)]).astype(np.float32)
    g = hnsw.build_hnsw(pts, m=3, ef_construction=8)
    cids = np.arange(len(pts), dtype=np.int64)
    hnsw.save_hnsw_index(spark, str(tmp_path / "tied"), g, cids)
    g2, _ = hnsw.load_hnsw_index(spark, str(tmp_path / "tied"))
    assert g2.layers == g.layers  # exact lists, exact order
    q = np.ones(4, dtype=np.float32)
    for ef in (1, 2, 4, 12):
        assert hnsw.hnsw_search(g2, q, k=3, ef=ef) == hnsw.hnsw_search(g, q, k=3, ef=ef)


def test_hnsw_full_ef_reaches_every_node_under_aggressive_pruning():
    """ADVICE r5: Algorithm-4 reverse-link pruning can orphan nodes once
    neighbor lists saturate, which would break the 'ef >= n is exact'
    claim outside the small-n regime. build_hnsw now ends with a
    reachability sweep + repair, so a full-ef search must enumerate ALL
    n nodes even with the most aggressive pruning (m=2, clustered points
    that fight over the same neighbor slots)."""
    rng = np.random.default_rng(11)
    # tight clusters maximize reverse-link churn on a tiny m
    centers = rng.normal(size=(8, 12)).astype(np.float32)
    pts = np.concatenate(
        [c + 0.01 * rng.normal(size=(50, 12)).astype(np.float32) for c in centers]
    )
    g = hnsw.build_hnsw(pts, m=2, ef_construction=8)
    n = pts.shape[0]
    q = rng.normal(size=12).astype(np.float32)
    found = hnsw.hnsw_search(g, q, k=n, ef=n)
    assert sorted(found) == list(range(n))
    # and exactness still holds end-to-end
    assert hnsw.hnsw_search(g, q, k=10, ef=n) == _brute_topk(pts, q, 10)
