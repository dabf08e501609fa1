"""functions.sampling + text.redact_pii: the training-corpus management
surface. The invariants that matter at 100 TB: assignments are per-row and
STABLE (growing the corpus moves nothing), caps hold exactly, and the
sharded export layout is one directory + one file per shard."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from blazingsql_spark.functions import sampling
from blazingsql_spark.functions.text import redact_pii
from blazingsql_spark.queries.registry import load_table
from tests.conftest import SF_DIR


def test_split_fractions_and_stability(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = sampling.assign_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    # 90/5/5 within binomial tolerance at fixture size
    assert abs(counts["train"] / total - 0.90) < 0.05
    assert abs(counts["val"] / total - 0.05) < 0.04
    assert abs(counts["test"] / total - 0.05) < 0.04

    # stability: assignment of the first half is identical when computed
    # over the full corpus — a row's split never depends on the rest
    half = docs.filter(F.col("doc_id") % 2 == 0)
    a = {r["doc_id"]: r["split"] for r in sampling.assign_split(half, "doc_id").select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_split(docs, "doc_id").filter(F.col("doc_id") % 2 == 0).select("doc_id", "split").collect()
    }
    assert a == b


def test_split_and_shard_are_decorrelated(spark):
    """Same key, different salts → independent decisions: the test-split
    docs must not pile into a subset of shards."""
    docs = load_table(spark, SF_DIR, "documents")
    both = sampling.assign_shard(sampling.assign_split(docs, "doc_id"), "doc_id", n_shards=4)
    shards_of_test = {
        r["shard"] for r in both.filter(F.col("split") == "test").select("shard").distinct().collect()
    }
    assert len(shards_of_test) == 4


def test_stratified_cap_holds_exactly(spark):
    docs = load_table(spark, SF_DIR, "documents")
    before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = sampling.stratified_cap(docs, ["lang"], cap=7)
    after = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in before.items():
        assert after[lang] == min(n, 7), lang
    # deterministic: same selection on rerun
    again = sampling.stratified_cap(docs, ["lang"], cap=7)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in again.select("doc_id").collect()
    )


def test_shard_write_layout(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "shards")
    sampling.shard_write(docs, path, n_shards=8)
    dirs = sorted(glob.glob(f"{path}/shard=*"))
    assert len(dirs) == 8
    for d in dirs:
        # repartition on shard id co-located each shard → exactly one file
        assert len(glob.glob(f"{d}/*.parquet")) == 1
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()


def test_redact_pii_units(spark):
    rows = [
        ("mail me at jane.doe+x@sub.example.co.uk today", "<EMAIL>"),
        ("call +1 (555) 123-4567 now", "<PHONE>"),
        ("server at 192.168.0.1 responded", "<IP>"),
        ("no pii here", "no pii here"),
    ]
    df = spark.createDataFrame(rows, ["text", "want"])
    out = df.select("text", "want", redact_pii(F.col("text")).alias("got")).collect()
    for r in out:
        assert r["want"] in r["got"], r
        assert "@" not in r["got"] or r["want"] == "no pii here"
        assert "192.168" not in r["got"]


def test_domain_mix_proportions(spark):
    """Surviving mix matches the target weights: the binding domain keeps
    ~100% of its rows, every domain's kept-count ≈ T·w within hash
    quantization noise."""
    docs = load_table(spark, SF_DIR, "documents")
    weights = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1}
    kept = sampling.domain_mix_sample(docs, weights, domain_col="lang")
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    T = min(counts[d] / w for d, w in weights.items())
    binding = min(weights, key=lambda d: counts[d] / weights[d])
    # binding domain: keep-rate 1 (minus at most a one-in-1e6 FP floor edge)
    assert got[binding] >= counts[binding] - 1
    for d, w in weights.items():
        expect = T * w
        # Bernoulli noise: 4 sigma of binomial stddev + quantization slack
        slack = 4 * (expect ** 0.5) + 2
        assert abs(got[d] - expect) <= slack, (d, got[d], expect)
    # determinism: rerun produces the identical kept set
    ids1 = {r["doc_id"] for r in kept.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in
            sampling.domain_mix_sample(docs, weights, domain_col="lang")
            .select("doc_id").collect()}
    assert ids1 == ids2


def test_domain_mix_drops_unlisted_domains(spark):
    """Domains absent from the weight map (or weighted 0) are dropped."""
    docs = load_table(spark, SF_DIR, "documents")
    kept = sampling.domain_mix_sample(
        docs, {"en": 0.7, "de": 0.3, "zh": 0.0}, domain_col="lang"
    )
    langs = {r["lang"] for r in kept.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}, langs


def test_deterministic_shuffle_reproducible_and_seed_independent(spark):
    from blazingsql_spark.functions.sampling import deterministic_shuffle

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    a = [r.doc_id for r in deterministic_shuffle(docs, seed="s1").collect()]
    b = [r.doc_id for r in deterministic_shuffle(docs, seed="s1").collect()]
    c = [r.doc_id for r in deterministic_shuffle(docs, seed="s2").collect()]
    assert a == b                      # same seed -> identical permutation
    assert a != c                      # different seed -> different order
    assert sorted(a) == sorted(c)      # ... of the same rows
    # repartitioning must not change the order (hash is per-row)
    d = [
        r.doc_id
        for r in deterministic_shuffle(docs.repartition(7), seed="s1").collect()
    ]
    assert a == d


def test_token_budget_head_cut_semantics(spark):
    from blazingsql_spark.functions.sampling import token_budget_head

    docs = load_table(spark, SF_DIR, "documents")
    out = token_budget_head(docs, budget=5000, token_col="n_chars").collect()
    assert out, "crossing document must be included (never empty)"
    rows = sorted(out, key=lambda r: r.cum_tokens)
    # every selected row's PREVIOUS total is under budget
    assert all(r.cum_tokens - r.n_chars < 5000 for r in rows)
    # the last selected row crosses (or exactly meets) the budget iff more
    # data existed: its successor would have prev-total >= budget
    total = sum(r.n_chars for r in docs.collect())
    if total > 5000:
        assert rows[-1].cum_tokens >= 5000
    # cum_tokens is a true prefix sum of n_chars in the selection order
    acc = 0
    for r in rows:
        acc += r.n_chars
        assert r.cum_tokens == acc


def test_dsir_weights_favor_target_like_docs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    target = docs.filter(F.col("lang") == "en")
    w = sampling.dsir_log_weights(docs, target, n_buckets=256)
    joined = w.join(docs.select("doc_id", "lang"), "doc_id")
    means = {
        r["lang"]: r["m"]
        for r in joined.groupBy("lang").agg(F.avg("dsir_logw").alias("m")).collect()
    }
    # the estimator's whole point: target-language docs score higher on
    # average than every other language under an en-slice target
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m, (lang, means)
    # every doc scored exactly once, none dropped
    assert w.count() == docs.count()
    assert w.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_dsir_weights_degenerate_target_is_zero(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    w = sampling.dsir_log_weights(docs, docs, n_buckets=64)
    # target == raw -> p_hat == q_hat -> log ratio identically 0
    mx = w.agg(F.max(F.abs(F.col("dsir_logw")))).first()[0]
    assert mx < 1e-9, mx


def test_dsir_empty_and_no_token_docs(spark):
    rows = [(1, "hello world hello"), (2, "   "), (3, "")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    w = sampling.dsir_log_weights(docs, docs.filter("doc_id = 1"), n_buckets=16)
    got = {r.doc_id: r.dsir_logw for r in w.collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == 0.0 and got[3] == 0.0  # token-free docs score 0, not NULL


def test_bin_pack_documents_invariants_and_quality(spark):
    """No-split packing: every doc lands in exactly one pack, packs never
    exceed the budget, offsets tile each pack contiguously (no gaps or
    overlaps), oversize docs get flagged singleton packs, and on a mixed
    workload the greedy histogram packer hits the pigeonhole lower bound
    or close (here: exactly)."""
    from blazingsql_spark.operators.packing import bin_pack_documents

    sizes = [5, 5, 5, 3, 3, 2, 2, 7, 7, 1, 9, 4, 6, 8, 10, 12]
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pdf = bin_pack_documents(df, budget=10).toPandas()
    assert len(pdf) == len(rows) and pdf.doc_id.is_unique
    fit = pdf[~pdf.oversize]
    loads = fit.groupby("pack_id").n_tokens.sum()
    assert (loads <= 10).all()
    for _pid, g in fit.groupby("pack_id"):
        g = g.sort_values("pack_offset")
        pos = 0
        for _, r in g.iterrows():
            assert r.pack_offset == pos
            pos += r.n_tokens
    over = pdf[pdf.oversize]
    assert list(over.n_tokens) == [12] and (over.pack_offset == 0).all()
    assert set(over.pack_id) & set(fit.pack_id) == set()
    total = int(fit.n_tokens.sum())
    assert fit.pack_id.nunique() == -(-total // 10)  # optimal here
    # determinism under repartition
    pdf2 = bin_pack_documents(df.repartition(7), budget=10).toPandas()
    a = pdf.sort_values("doc_id").reset_index(drop=True)
    b = pdf2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_contrastive_negatives_guards(spark):
    """Review regressions on the negative sampler: zero-norm embeddings
    must not crash under ANSI mode (NULL cosine, pair dropped); NULL ids
    are excluded; k negatives come back deterministic and self-exclusive."""
    from blazingsql_spark.functions.sampling import contrastive_negatives
    import random as _r

    rnd = _r.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(6)]) for i in range(40)]
    rows.append((100, [0.0] * 6))  # zero vector: ANSI divide guard
    rows.append((None, [1.0] * 6))  # NULL id: excluded
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    anchors = emb.filter(F.col("vec_id").isNotNull() & (F.col("vec_id") < 3)).select(
        F.col("vec_id").alias("anchor_id"), "embedding"
    )
    out = contrastive_negatives(emb, anchors, k=3, pool_size=16).collect()
    assert out  # no DIVIDE_BY_ZERO abort
    by_anchor = {}
    for r in out:
        assert r.neg_id is not None and r.neg_id != r.anchor_id
        by_anchor.setdefault(r.anchor_id, []).append((r.rank, r.neg_id))
    for a, negs in by_anchor.items():
        assert [rk for rk, _ in sorted(negs)] == list(range(1, len(negs) + 1))
    # deterministic across invocations
    again = contrastive_negatives(emb, anchors, k=3, pool_size=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # the zero vector itself never surfaces as a negative of anyone
    zero_anchor = emb.filter(F.col("vec_id") == 100).select(
        F.col("vec_id").alias("anchor_id"), "embedding"
    )
    z = contrastive_negatives(emb, zero_anchor, k=3, pool_size=16).collect()
    assert z == []  # all its cosines are NULL -> no pairs survive
