"""Unit tests for functions/ pieces not covered by SQL oracles (initcap-less
DuckDB, engine-specific hashing, stubbed decoders) and the config mapping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blazingsql_spark.config import apply_config_options
from blazingsql_spark.functions import dedup, multimodal, text
from blazingsql_spark.queries.registry import load_table

SF = "/root/testdata/sf0.001"


def test_initcap_and_string_surface(spark):
    # INITCAP exists in the reference op map (expression_utils.cpp:314) but
    # DuckDB lacks it — covered here instead of the oracle suite.
    row = spark.sql(
        "SELECT initcap('hello spark world') AS ic, reverse('abc') AS rv,"
        " left('hello', 2) AS l2, repeat('ab', 3) AS rp"
    ).first()
    assert row.ic == "Hello Spark World"
    assert row.rv == "cba"
    assert row.l2 == "he"
    assert row.rp == "ababab"


def test_word_shingles_edges(spark):
    df = spark.createDataFrame(
        [("a b c",), ("single",), ("  padded   tokens  ",), ("x y",)], ["text"]
    )
    out = df.select(dedup.word_shingles(F.col("text"), 2).alias("s")).collect()
    assert out[0].s == ["a b", "b c"]
    assert out[1].s == []  # fewer tokens than n → empty, never inverted
    assert out[2].s == ["padded tokens"]
    assert out[3].s == ["x y"]


def test_simhash_identical_docs_zero_distance(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"), (3, "zz yy xx ww vv")],
        ["doc_id", "text"],
    )
    pairs = dedup.simhash_near_pairs(df, bits=32, max_hamming=3).collect()
    assert {(p.id_a, p.id_b, p.hamming) for p in pairs} == {(1, 2, 0)}


def test_minhash_duplicate_docs_collide(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(20)
    dup = docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    pairs = dedup.lsh_candidate_pairs(docs.union(dup))
    got = {(p.id_a, p.id_b) for p in pairs.collect()}
    for d in docs.collect():
        assert (d.doc_id, d.doc_id + 1000) in got


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "el gato de la casa que duerme"),
            (3, "zzz qqq www"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.lang_pred for r in text.lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "und"}


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("short words only",), ("internationalization",)], ["text"])
    out = df.select(text.bpe_ish_token_count(F.col("text")).alias("n")).collect()
    assert out[0].n >= 3  # at least one token per word
    assert out[1].n > 1  # long word splits into multiple BPE-ish chunks


def test_multimodal_decode_stub_contract(spark):
    docs = load_table(spark, SF, "documents").limit(10)
    feats = multimodal.decode_features(multimodal.attach_binary(docs), feature_dim=8)
    rows = feats.collect()
    assert len(rows) == 10
    assert all(len(r.features) == 8 for r in rows)
    # fake=False REALLY decodes PNG/WAV (tests/test_media_codec.py); for a
    # format the zero-dependency codec cannot handle (raw text bytes) the
    # boundary surfaces at execution time, naming the plug-in point
    with pytest.raises(Exception, match="PNG/WAV|NotImplemented"):
        multimodal.decode_features(
            multimodal.attach_binary(docs), fake=False
        ).collect()


def test_frame_sample_plan(spark):
    docs = load_table(spark, SF, "documents").limit(3)
    plan = multimodal.frame_sample_plan(docs, n_frames=4)
    assert plan.count() == 12
    assert plan.filter("offset_pct >= 1.0").count() == 0


def test_apply_config_options(spark):
    applied = apply_config_options(
        spark,
        {
            "JOIN_PARTITION_SIZE_THRESHOLD": 400 * 1024 * 1024,
            "MEMORY_MONITOR_PERIOD": 50,  # no Spark knob → ignored
            "UNKNOWN_OPTION": 1,
        },
    )
    assert applied["JOIN_PARTITION_SIZE_THRESHOLD"] == "spark.sql.autoBroadcastJoinThreshold"
    assert "MEMORY_MONITOR_PERIOD" not in applied
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == str(400 * 1024 * 1024)
    # restore the session default so other tests keep broadcasting behavior
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))


def test_ivf_recall_vs_bruteforce(spark):
    from pyspark.sql import functions as F

    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=4)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    # self-match (rank 1, cosine 1.0) must always be found; recall sane
    for qid in {q for q, _ in exact_set}:
        assert (qid, qid) in approx_set
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.4, recall


def test_multiprobe_lsh_beats_single_probe_recall(spark):
    from pyspark.sql import functions as F

    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.vec_id) for r in similarity.cosine_topk(emb, queries, k=5).collect()}
    # small bands on the tiny local fixture so buckets are populated; the
    # production default (4x16) is exercised by the oracle queries
    single = {
        (r.query_id, r.vec_id)
        for r in similarity.ann_lsh_topk(emb, queries, k=5, bands=4, bits_per_band=2).collect()
    }
    multi = {
        (r.query_id, r.vec_id)
        for r in similarity.ann_lsh_topk_multiprobe(
            emb, queries, k=5, bands=4, bits_per_band=2
        ).collect()
    }
    recall_single = len(exact & single) / len(exact)
    recall_multi = len(exact & multi) / len(exact)
    assert recall_multi >= recall_single
    assert recall_multi >= 0.3

    # banded self-match guarantee: identical vectors agree in every band,
    # so each query must at least find itself
    for qid in {q for q, _ in exact}:
        assert (qid, qid) in single


def test_lsh_band_signature_paths_identical(spark):
    """The vectorized (Arrow/numpy) and pure-JVM-expression signature paths
    must produce bit-identical signatures — the numpy fold is sequential
    over dims precisely so it matches the SQL left-fold."""
    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings")
    fast = {
        (r.vec_id, r.band): r.band_sig
        for r in similarity.lsh_band_signatures(emb, vectorized=True)
        .select("vec_id", "band", "band_sig")
        .collect()
    }
    jvm = {
        (r.vec_id, r.band): r.band_sig
        for r in similarity.lsh_band_signatures(emb, vectorized=False)
        .select("vec_id", "band", "band_sig")
        .collect()
    }
    assert fast == jvm and len(fast) > 0


def test_incremental_near_dup_check(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    index_path = str(tmp_path / "minhash_index")
    dedup.build_signature_index(docs, index_path)

    # new batch: one exact copy of doc 7, one fresh nonsense doc
    new_docs = docs.filter("doc_id = 7").select(
        (F.col("doc_id") + 90000).alias("doc_id"), "text"
    ).union(
        spark.createDataFrame(
            [(90001, "qqq www eee rrr ttt yyy uuu iii ooo ppp")], ["doc_id", "text"]
        )
    )
    hits = dedup.incremental_near_dup_check(spark, new_docs, index_path)
    pairs = {(r.new_id, r.corpus_id) for r in hits.collect()}
    assert (90007, 7) in pairs  # the copy is flagged against the corpus
    assert not any(n == 90001 for n, _ in pairs)  # fresh doc is clean


def test_asof_join_tolerance(spark):
    from blazingsql_spark.operators import asof_join

    left = spark.createDataFrame([(1, 100), (1, 200)], ["k", "t"])
    right = spark.createDataFrame([(1, 95, "near"), (1, 10, "far")], ["k", "t", "tag"])
    # without tolerance: t=100 matches 95, t=200 also matches 95 (latest <= 200)
    no_tol = {r.t: r.tag for r in asof_join(left, right, on="t", by=["k"]).collect()}
    assert no_tol == {100: "near", 200: "near"}
    # tolerance 10: t=100 keeps the match (gap 5), t=200 drops it (gap 105)
    from pyspark.sql import functions as F

    with_tol = {
        r.t: r.tag
        for r in asof_join(left, right, on="t", by=["k"], tolerance=F.lit(10)).collect()
    }
    assert with_tol == {100: "near", 200: None}


def test_pq_roundtrip_and_recall(spark):
    """PQ compresses to m codes + a norm; ADC + exact re-rank recovers
    most of the true top-k (measured 0.92 at these settings; 0.6 is the
    regression floor). Encoding must be deterministic across retrains."""
    from pyspark.sql import functions as F

    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings")
    books = similarity.pq_train_codebooks(emb, m=16, ksub=16, iterations=3)
    books.cache()
    assert books.count() == 16 * 16
    enc = similarity.pq_encode(emb, books, m=16)
    enc.cache()
    first = enc.orderBy("vec_id").first()
    assert len(first["codes"]) == 16 and first["norm"] > 0

    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=5)
    approx = similarity.pq_topk_reranked(emb, enc, books, queries, k=5, m=16, ksub=16)
    exact_set = {(r.query_id, r.vec_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.vec_id) for r in approx.collect()}
    for qid in {q for q, _ in exact_set}:
        assert (qid, qid) in approx_set  # self-match always survives re-rank
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6, recall

    books2 = similarity.pq_train_codebooks(emb, m=16, ksub=16, iterations=3)
    enc2 = similarity.pq_encode(emb, books2, m=16)
    assert sorted(map(tuple, enc.select("vec_id", "codes").collect())) == sorted(
        map(tuple, enc2.select("vec_id", "codes").collect())
    )


def test_ivfpq_recall_vs_bruteforce(spark):
    """IVF routes, residual-PQ ranks, exact re-rank finishes: measured
    recall@5 = 1.0 at n_probe=6/8, m=16 on the fixture; 0.7 is the
    regression floor. Self-matches must always survive."""
    from pyspark.sql import functions as F

    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.vec_id) for r in similarity.cosine_topk(emb, queries, k=5).collect()}
    approx = {
        (r.query_id, r.vec_id)
        for r in similarity.ivfpq_topk(
            emb, queries, k=5, n_centroids=8, n_probe=6, m=16, ksub=16
        ).collect()
    }
    for qid in {q for q, _ in exact}:
        assert (qid, qid) in approx
    assert len(exact & approx) / len(exact) >= 0.7


def test_ann_index_incremental_extension(spark, tmp_path):
    """Persisted IVF-PQ index + frozen-codebook extension: after appending
    a new batch, searching the loaded index must equal searching an index
    whose encoded table was built in one shot against the SAME frozen
    artifacts — and new vectors must be findable (self-match)."""
    from pyspark.sql import functions as F

    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings")
    old = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)

    cents, books, enc_old = similarity.ivfpq_build(old, n_centroids=8, m=8, ksub=16)
    path = str(tmp_path / "annidx")
    similarity.save_ann_index(path, cents, books, enc_old)
    similarity.extend_ann_index(spark, path, new, m=8)

    cents2, books2, enc_all = similarity.load_ann_index(spark, path)
    assert enc_all.count() == emb.count()

    queries = new.filter(F.col("vec_id") % 50 == 1).limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.ivfpq_topk(
        emb, queries, k=3, n_centroids=8, n_probe=6, m=8, ksub=16,
        prebuilt=(cents2, books2, enc_all),
    )
    hits = {(r.query_id, r.vec_id) for r in got.collect()}
    for r in queries.select("query_id").collect():
        assert (r.query_id, r.query_id) in hits  # new vectors are searchable


def test_chunk_documents_properties(spark):
    """Chunks must tile every document: first chunk starts at token 0,
    consecutive chunks overlap by exactly `overlap` tokens, all tokens are
    covered, and empty docs survive as one empty chunk."""
    from pyspark.sql import functions as F

    from blazingsql_spark.operators.packing import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(100))),  # multi-chunk
        (2, " ".join(f"t{i}" for i in range(32))),   # exactly one chunk
        (3, "short doc"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, max_tokens=32, overlap=8).orderBy("doc_id", "chunk_id").collect()

    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["n_chunk_tokens"] for r in by_doc[1]] == [32, 32, 32, 28]  # 100 = 24*3 + 28
    stride_toks = [c["chunk_text"].split(" ") for c in by_doc[1]]
    for a, b in zip(stride_toks, stride_toks[1:]):
        assert a[24:] == b[:8]  # 8-token overlap carried forward
    flat = stride_toks[0] + [t for c in stride_toks[1:] for t in c[8:]]
    assert flat == [f"t{i}" for i in range(100)]  # full coverage, no gaps
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 32
    assert len(by_doc[4]) == 1 and by_doc[4][0]["n_chunk_tokens"] == 0


def test_remove_boilerplate_lines_units(spark):
    from blazingsql_spark.functions.text import remove_boilerplate_lines

    rows = [
        (1, "alpha\nFOOTER\nbody one"),
        (2, "beta\nFOOTER\nbody two"),
        (3, "gamma\nFOOTER"),
        (4, "delta only"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(df, min_df=3).collect()}
    assert out[1] == "alpha\nbody one"      # FOOTER (df=3) removed
    assert out[2] == "beta\nbody two"
    assert out[3] == "gamma"
    assert out[4] == "delta only"           # untouched
    # below threshold: nothing removed
    out2 = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(df, min_df=4).collect()}
    assert out2[1] == "alpha\nFOOTER\nbody one"


def test_connected_components_shapes(spark):
    from blazingsql_spark.operators.graph import canonical_docs, connected_components

    # chain 1-2-3-4 (diameter 3), cycle 10-11-12-10, star 20-{21,22,23},
    # isolated edge 30-31
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10),
         (20, 21), (20, 22), (20, 23), (30, 31)],
        ["src", "dst"],
    )
    comp = {r["node"]: r["component_id"] for r in connected_components(edges).collect()}
    assert {n: comp[n] for n in (1, 2, 3, 4)} == {n: 1 for n in (1, 2, 3, 4)}
    assert {comp[n] for n in (10, 11, 12)} == {10}
    assert {comp[n] for n in (20, 21, 22, 23)} == {20}
    assert {comp[n] for n in (30, 31)} == {30}

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 4, 10, 20, 21, 30, 31, 99)],
        ["doc_id", "text"],
    )
    pairs = edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    kept = {r["doc_id"] for r in canonical_docs(pairs, docs).collect()}
    # one canonical per component + untouched isolated doc 99
    assert kept == {1, 10, 20, 30, 99}


def test_unigram_logprob_ranks_junk_higher(spark):
    """A doc of corpus-unseen tokens must score strictly higher (more
    surprising) than a doc of the corpus's most common tokens."""
    from blazingsql_spark.functions.text import unigram_negative_logprob

    rows = [(i, "the cat sat on the mat") for i in range(20)]
    rows += [(100, "the the the the"), (101, "zzq qxv wvv jjk")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["avg_neg_logprob"]
           for r in unigram_negative_logprob(df, min_count=2).collect()}
    assert out[101] > out[100], out
    assert out[101] > out[0], out


def test_duplicated_ngram_spans_flags_shared_spans_only(spark):
    """Docs sharing a 3-token span get n_dup > 0 on exactly the shared
    grams; a fully unique doc scores 0; docs under 3 tokens drop out."""
    from blazingsql_spark.functions.dedup import duplicated_ngram_spans

    rows = [
        (1, "all rights reserved to alpha corp"),
        (2, "content here all rights reserved now"),
        (3, "completely unique sentence without overlap"),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in duplicated_ngram_spans(df, n=3).collect()}
    assert 4 not in out                       # 2 tokens -> no 3-gram
    assert out[3]["n_dup"] == 0
    assert out[3]["dup_frac"] == 0.0
    # doc1: grams at positions 0..3; "all rights reserved" shared with doc2
    assert out[1]["n_grams"] == 4
    assert out[1]["n_dup"] == 1
    assert out[2]["n_dup"] == 1
    # hot-gram cap: df=2 gram vanishes when max_gram_df=1
    capped = {r["doc_id"]: r["n_dup"]
              for r in duplicated_ngram_spans(df, n=3, max_gram_df=1).collect()}
    assert capped[1] == 0 and capped[2] == 0


def test_pq_drift_triggers_on_distribution_shift(spark):
    """Frozen codebooks reconstruct in-distribution batches at ~baseline
    error (no retrain) and distribution-shifted batches much worse
    (retrain=true) — the maintenance loop behind extend_ann_index."""
    from blazingsql_spark.functions.similarity import (
        ann_index_drift_report,
        pq_quantization_error,
        pq_train_codebooks,
    )

    dim, m = 8, 2
    base = spark.createDataFrame(
        [(i, [float((i * j) % 5) for j in range(1, dim + 1)]) for i in range(64)],
        ["vec_id", "embedding"],
    )
    shifted = spark.createDataFrame(
        [(i, [float((i * j) % 5) + 25.0 for j in range(1, dim + 1)]) for i in range(64)],
        ["vec_id", "embedding"],
    )
    books = pq_train_codebooks(base, m=m, ksub=4, iterations=2, dim=dim)
    baseline = pq_quantization_error(base, books, m=m, dim=dim).first()["mean_sq_error"]

    ok = ann_index_drift_report(
        baseline, pq_quantization_error(base, books, m=m, dim=dim)
    ).first()
    assert ok["retrain"] is False and abs(ok["drift_ratio"] - 1.0) < 1e-9

    bad = ann_index_drift_report(
        baseline, pq_quantization_error(shifted, books, m=m, dim=dim)
    ).first()
    assert bad["retrain"] is True and bad["drift_ratio"] > 1.5
    assert bad["n_vectors"] == 64


def test_linear_fit_recovers_exact_model_and_ridge_shrinks(spark):
    """Noise-free linear data → exact recovery (to solver precision);
    ridge shrinks weights toward zero; predict reproduces labels; NULL
    rows are skipped like SQL REGR_*."""
    from blazingsql_spark.functions.ml import linear_fit, linear_predict

    rows = [
        (float(i), float((i * 7) % 13), 2.5 + 3.0 * i + -1.25 * ((i * 7) % 13))
        for i in range(50)
    ]
    rows.append((None, 1.0, 999.0))  # must be dropped
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")

    fit = linear_fit(df, ["x1", "x2"], "y")
    assert fit["n"] == 50
    assert abs(fit["weights"]["x1"] - 3.0) < 1e-8
    assert abs(fit["weights"]["x2"] + 1.25) < 1e-8
    assert abs(fit["intercept"] - 2.5) < 1e-6

    scored = linear_predict(df.na.drop(), fit)
    resid = scored.select(F.max(F.abs(F.col("prediction") - F.col("y"))).alias("r"))
    assert resid.first()["r"] < 1e-6

    ridged = linear_fit(df, ["x1", "x2"], "y", l2=1e4)
    assert abs(ridged["weights"]["x1"]) < abs(fit["weights"]["x1"])
    assert abs(ridged["weights"]["x2"]) < abs(fit["weights"]["x2"])


def test_space_saving_sketch_finds_heavy_hitters_under_eviction(spark):
    """Cardinality (200) far above capacity (16) forces constant eviction,
    yet every item with frequency above the survival bound must be
    retained, with est >= true count."""
    from blazingsql_spark.functions.sketches import space_saving_topk

    # 3 heavy items (500 each) + 197 singletons-ish (5 each): N = 2485,
    # N/capacity ~ 155 — heavies are 3x above the bound
    rows = [(f"hot{i % 3}",) for i in range(1500)]
    rows += [(f"cold{i % 197}",) for i in range(985)]
    df = spark.createDataFrame(rows, ["v"]).repartition(4)

    top = space_saving_topk(df, "v", k=5, capacity=16).collect()
    items = {r["item"]: r["est"] for r in top}
    for h in ("hot0", "hot1", "hot2"):
        assert h in items, items
        assert items[h] >= 500  # never undercounts retained items
    assert len(top) == 5


def test_fuzzy_join_covers_all_single_edit_kinds(spark):
    """Deletion-neighborhood blocking must recover substitution, insertion,
    deletion, and exact matches (the d<=1 completeness theorem) and must
    NOT match at distance 2."""
    from blazingsql_spark.operators import fuzzy_join

    left = spark.createDataFrame(
        [(1, "kitten"), (2, "kitte"), (3, "kittens"), (4, "mitten"), (5, "xxyyzz")],
        ["lid", "lname"],
    )
    right = spark.createDataFrame([(10, "kitten")], ["rid", "rname"])
    got = {
        (r["lid"], r["edit_distance"])
        for r in fuzzy_join(left, right, "lname", "rname").collect()
    }
    assert got == {(1, 0), (2, 1), (3, 1), (4, 1)}, got


def test_group_percentile_cont_matches_builtin(spark):
    """operators.stats.group_percentile_cont must be BIT-identical to
    Spark's PERCENTILE_CONT (which the DuckDB oracles also match) — the
    distributed rank-based form is a plan change, not a semantics change."""
    from pyspark.sql import functions as F

    from blazingsql_spark.operators.stats import group_percentile_cont
    from tests.conftest import SF_DIR

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    mine = {
        r.l_returnflag: (r.lo, r.med, r.hi)
        for r in group_percentile_cont(
            li, ["l_returnflag"], "l_extendedprice",
            {"lo": 0.05, "med": 0.5, "hi": 0.95},
        ).collect()
    }
    builtin = {
        r.l_returnflag: (r.lo, r.med, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(
                    f"percentile_cont({q}) WITHIN GROUP "
                    "(ORDER BY CAST(l_extendedprice AS DOUBLE))"
                ).alias(nm)
                for nm, q in (("lo", 0.05), ("med", 0.5), ("hi", 0.95))
            ]
        )
        .collect()
    }
    assert mine == builtin  # bit-exact, no tolerance

    # edge cases: single-row group, two-row interpolation, NULLs excluded
    edge = spark.createDataFrame(
        [("a", 5.0), ("b", 1.0), ("b", 2.0), ("b", None)], ["k", "v"]
    )
    got = {
        r.k: r.p50
        for r in group_percentile_cont(edge, ["k"], "v", {"p50": 0.5}).collect()
    }
    assert got == {"a": 5.0, "b": 1.5}


def test_interval_join_matches_bruteforce_and_avoids_nested_loop(spark):
    from pyspark.sql import functions as F

    from blazingsql_spark.operators.asof import interval_join
    from blazingsql_spark.plans import join_strategies

    left = spark.createDataFrame(
        [(1, "k", 0.0, 10.0), (2, "k", 50.0, 60.0), (3, "j", 0.0, 100.0)],
        ["lid", "k", "ls", "le"],
    )
    right = spark.createDataFrame(
        [(10, "k", 5.0, 6.0),     # inside 1
         (11, "k", 9.0, 55.0),    # overlaps 1 AND 2, spans many buckets
         (12, "k", 60.0, 70.0),   # touches 2 only at the open end — no match
         (13, "j", 99.0, 101.0),  # overlaps 3
         (14, "k", 200.0, 300.0)],  # no overlap
        ["rid", "k", "rs", "re"],
    )
    out = interval_join(left, right, "ls", "le", "rs", "re", bucket_width=10.0, by=["k"])
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    # brute force: half-open overlap ls < re and rs < le
    brute = sorted(
        (l[0], r[0])
        for l in [(1, "k", 0.0, 10.0), (2, "k", 50.0, 60.0), (3, "j", 0.0, 100.0)]
        for r in [(10, "k", 5.0, 6.0), (11, "k", 9.0, 55.0), (12, "k", 60.0, 70.0),
                  (13, "j", 99.0, 101.0), (14, "k", 200.0, 300.0)]
        if l[1] == r[1] and l[2] < r[3] and r[2] < l[3]
    )
    assert pairs == brute  # exact result incl. multi-bucket dedup
    strategies = join_strategies(out)
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies


def test_interval_join_integer_endpoints_above_2_53(spark):
    """Integral endpoints bucket in pure long arithmetic: above 2^53 the
    old double-division FLOOR(x/w) rounds, registers intervals in wrong
    buckets, and silently drops overlapping pairs (epoch-nanosecond
    territory). Two adjacent 1000-wide intervals around 2^60 must pair
    exactly with their true overlaps."""
    from blazingsql_spark.operators.asof import interval_join

    base = 1 << 60  # far beyond double's 2^53 integer precision
    left = spark.createDataFrame(
        [(1, base + 1, base + 1000), (2, base + 2000, base + 3000)],
        ["lid", "ls", "le"],
    )
    right = spark.createDataFrame(
        [(10, base + 999, base + 1001),   # overlaps 1 only
         (11, base + 1000, base + 2001),  # overlaps 2 only (half-open)
         (12, base + 5000, base + 6000)], # no overlap
        ["rid", "rs", "re"],
    )
    out = interval_join(left, right, "ls", "le", "rs", "re", bucket_width=1000)
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    assert pairs == [(1, 10), (2, 11)]


def test_range_join_integer_keys_above_2_53(spark):
    """range_join shares interval_join's integral bucket fast path
    (VERDICT r4 #2: the 2^53 double-rounding hazard was fixed in
    interval_join but not mirrored here). Epoch-nano-scale keys around
    2^60 must pair exactly by |l - r| <= d; the old FLOOR(x/w) double
    path rounds the bucket and silently drops pairs."""
    from blazingsql_spark.operators.asof import range_join

    base = 1 << 60
    left = spark.createDataFrame(
        [(1, base + 1), (2, base + 5000), (3, base + 10**7)], ["lid", "lt"]
    )
    right = spark.createDataFrame(
        [(10, base + 900),          # within 1000 of left 1
         (11, base + 5999),         # within 1000 of left 2 (adjacent bucket)
         (12, base + 10**7 + 1000), # exactly at distance 1000 of left 3
         (13, base + 10**6)],       # far from everything
        ["rid", "rt"],
    )
    out = range_join(left, right, "lt", "rt", max_distance=1000)
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    brute = sorted(
        (lid, rid)
        for lid, lt in [(1, base + 1), (2, base + 5000), (3, base + 10**7)]
        for rid, rt in [(10, base + 900), (11, base + 5999),
                        (12, base + 10**7 + 1000), (13, base + 10**6)]
        if abs(lt - rt) <= 1000
    )
    assert pairs == brute == [(1, 10), (2, 11), (3, 12)]


def test_l2_normalize_hoisted_norm_and_zero_vector(spark):
    """The norm must be evaluated once per row (not once per element —
    O(d^2)), zero vectors must normalize to zeros (not NULL/NaN), and
    the unit-norm contract must hold."""
    from blazingsql_spark.functions.similarity import l2_norm, l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], ["id", "v"]
    )
    out = {r["id"]: r["u"] for r in df.select("id", l2_normalize(F.col("v")).alias("u")).collect()}
    assert out[1] == [0.6, 0.8]
    assert out[2] == [0.0, 0.0]
    # hoist check: the aggregate appears ONCE in the expression tree, not
    # once per element inside the division lambda
    expr_str = str(l2_normalize(F.col("v"))._jc)
    assert expr_str.count("aggregate") <= 2  # dot() once (+outer transform)


def test_group_percentile_cont_global_no_keys(spark):
    """keys=[] computes GLOBAL percentiles (the equi-depth histogram
    path) — same bit-exact contract as the grouped form."""
    from pyspark.sql import functions as F

    from blazingsql_spark.operators.stats import group_percentile_cont
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_totalprice").cast("double").alias("v")
    )
    mine = group_percentile_cont(orders, [], "v", {"p25": 0.25, "p75": 0.75}).first()
    builtin = orders.agg(
        F.expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY v)").alias("p25"),
        F.expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY v)").alias("p75"),
    ).first()
    assert (mine.p25, mine.p75) == (builtin.p25, builtin.p75)


def test_connected_components_raises_on_nonconvergence(spark):
    """The iteration cap is a safety valve, not an answer-shaper: an
    unconverged run must RAISE (a silently truncated label propagation
    returned one wrong dedup survivor at sf0.1 before this guard)."""
    import pytest as _pytest

    from blazingsql_spark.operators.graph import connected_components

    path = spark.createDataFrame([(i, i + 1) for i in range(30)], ["src", "dst"])
    with _pytest.raises(RuntimeError, match="not converged"):
        connected_components(path, max_iterations=3, algorithm="propagate").count()
    # and with room to converge, the 30-node path is one component
    from pyspark.sql import functions as F

    cc = connected_components(path, max_iterations=100, algorithm="propagate")
    assert cc.filter(F.col("component_id") != 0).count() == 0


def test_star_components_deep_chain_olog_rounds(spark):
    """The default star-contraction algorithm must converge on a DEEP
    path graph within an O(log n) round budget — the shape that costs
    min-label propagation O(n) rounds (the 100-round cap would raise).
    A 4096-node chain (diameter 4095) capped at 16 rounds: passing at
    all proves the logarithmic round count; the result must be the
    single component rooted at node 0."""
    from blazingsql_spark.operators.graph import connected_components

    n = 4096
    path = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["src", "dst"])
    cc = connected_components(path, max_iterations=16)  # algorithm="star"
    rows = cc.collect()
    assert len(rows) == n
    assert {r["component_id"] for r in rows} == {0}


def test_pagerank_dangling_mass_conserved(spark):
    """With the default dangling-mass redistribution, total rank must
    stay 1 each iteration even when nodes have no out-edges; the leaky
    textbook variant (redistribute_dangling=False, kept only for
    engine-exact unrolled oracles) strictly loses mass on the same
    graph. Also: no forced broadcast of the O(|nodes|) out-degree table
    (a web-scale graph would OOM executors under a mandatory hint)."""
    from blazingsql_spark.operators.graph import pagerank

    # 1->2->3, 4->3: nodes 3 is dangling (no out-edges)
    edges = spark.createDataFrame([(1, 2), (2, 3), (4, 3)], ["src", "dst"])
    total = (
        pagerank(edges, iterations=4).agg(F.sum("rank")).first()[0]
    )
    assert abs(total - 1.0) < 1e-9, total
    leaky = (
        pagerank(edges, iterations=4, redistribute_dangling=False)
        .agg(F.sum("rank"))
        .first()[0]
    )
    assert leaky < 1.0 - 1e-6, leaky
    # plan hygiene: the out-degree side must carry no mandatory broadcast
    # hint (the per-round localCheckpoint hides the join plan behind a
    # LogicalRDD leaf, so inspect the operator source directly)
    import inspect

    import blazingsql_spark.operators.graph as graph_mod

    src_text = inspect.getsource(graph_mod.pagerank)
    assert "broadcast(outdeg" not in src_text


def test_star_matches_propagate_on_mixed_graph(spark):
    """Star contraction and min-label propagation are different
    algorithms for the same function — byte-identical (node,
    component_id) output on a graph mixing chains, cycles, stars, and
    duplicate/reversed edges."""
    from blazingsql_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10),
         (20, 21), (20, 22), (20, 23), (30, 31), (31, 30), (2, 1),
         (40, 40)],  # self-loop only: singleton component in both
        ["src", "dst"],
    )
    star = {(r["node"], r["component_id"])
            for r in connected_components(edges, algorithm="star").collect()}
    prop = {(r["node"], r["component_id"])
            for r in connected_components(edges, algorithm="propagate").collect()}
    assert star == prop
    assert (40, 40) in star  # self-loop-only node kept as singleton


@pytest.mark.slow  # soak/randomized long-tail: nightly tier (r13, driver verify budget)
def test_incremental_components_matches_full_recompute(spark):
    """Label maintenance across edge batches must equal a full CC over the
    cumulative edge set after EVERY batch — including cross-batch
    component merges, new-node-becomes-minimum relabels, and batches
    that touch nothing old."""
    from blazingsql_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    batches = [
        [(10, 11), (12, 13), (20, 21)],          # three fresh components
        [(11, 12)],                              # merge {10,11} with {12,13}
        [(30, 31), (31, 32)],                    # untouched old, new chain
        [(1, 20)],                               # new node 1 becomes the min of {20,21}
        [(13, 30), (32, 20)],                    # chain-merge three components
    ]
    labels = None
    seen: list[tuple[int, int]] = []
    for batch in batches:
        seen += batch
        bdf = spark.createDataFrame(batch, ["src", "dst"])
        labels = incremental_components(labels, bdf).localCheckpoint(eager=True)
        full = connected_components(spark.createDataFrame(seen, ["src", "dst"]))
        got = sorted(map(tuple, labels.collect()))
        want = sorted(map(tuple, full.collect()))
        assert got == want, f"after batch {batch}: {got} != {want}"


@pytest.mark.slow  # soak/randomized long-tail: nightly tier (r13, driver verify budget)
def test_incremental_components_randomized(spark):
    """Randomized batches over a small node universe: heavy merge traffic,
    duplicate edges, self-loops — incremental must track full recompute."""
    import random

    from blazingsql_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    rng = random.Random(17)
    labels = None
    seen = []
    for _ in range(4):
        batch = [(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(12)]
        seen += batch
        bdf = spark.createDataFrame(batch, ["src", "dst"])
        labels = incremental_components(labels, bdf).localCheckpoint(eager=True)
    got = sorted(map(tuple, labels.collect()))
    want = sorted(
        map(tuple, connected_components(spark.createDataFrame(seen, ["src", "dst"])).collect())
    )
    assert got == want


def test_dedup_components_incremental_staged_oracle(spark, oracle):
    """The r7-staged registry row (queries/graph_inc.py): driver-faithful
    compare green now, so the future registration flip is risk-free."""
    import blazingsql_spark.queries.graph_inc  # noqa: F401  (self-registers)

    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(spark, oracle, "dedup_components_incremental")


def _python_bpe(word_freqs: dict, n_merges: int):
    """Sequential reference BPE: same tiebreak (count desc, a asc, b asc)."""
    state = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, syms in state.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (a, b), _ = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b))
        for w, syms in state.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            state[w] = out
    vocab: dict = {}
    for w, syms in state.items():
        for s in syms:
            vocab[s] = vocab.get(s, 0) + word_freqs[w]
    return merges, vocab


def test_train_bpe_matches_sequential_reference(spark):
    """The distributed trainer must produce the SAME ordered merge list
    and final vocabulary as a sequential pure-Python BPE over the same
    word-frequency dict — merge by merge, including tiebreaks and the
    greedy left-to-right within-word application (aaa + (a,a) -> [aa, a])."""
    from blazingsql_spark.functions.text import train_bpe

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(60)
    # default: driver fast path (vocab fits); None forces the distributed
    # per-merge loop — both must equal the sequential reference AND each
    # other, merge list and vocabulary alike
    got_merges, got_vocab_df = train_bpe(docs, n_merges=8)
    dist_merges, dist_vocab_df = train_bpe(docs, n_merges=8, driver_vocab_rows=None)

    from blazingsql_spark.functions.text import _tokens

    wf = {
        r.token: r.freq
        for r in _tokens(docs, "doc_id", "text")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .collect()
    }
    want_merges, want_vocab = _python_bpe(wf, 8)
    assert got_merges == want_merges
    assert dist_merges == want_merges
    got_vocab = {r.symbol: r.freq for r in got_vocab_df.collect()}
    assert got_vocab == want_vocab
    dist_vocab = {r.symbol: r.freq for r in dist_vocab_df.collect()}
    assert dist_vocab == want_vocab


def test_train_bpe_driver_path_bound_fallback(spark):
    """A driver_vocab_rows bound smaller than the vocab must fall back to
    the distributed loop (same answer); the fast path at many merges must
    exhaust cleanly when no pair repeats."""
    from blazingsql_spark.functions.text import train_bpe

    df = spark.createDataFrame(
        [(1, "ab ab ab cd cd xyz")], ["doc_id", "text"]
    )
    fast = train_bpe(df, n_merges=50)  # exhausts merges, must stop early
    slow = train_bpe(df, n_merges=50, driver_vocab_rows=1)  # vocab=3 > 1
    assert fast[0] == slow[0]
    assert {r.symbol: r.freq for r in fast[1].collect()} == {
        r.symbol: r.freq for r in slow[1].collect()
    }


def test_train_bpe_greedy_overlap_semantics(spark):
    """'aaaa' with merge (a,a): non-overlapping left-to-right -> [aa, aa];
    then (aa, aa) -> [aaaa]. The fold must not chain-merge within a pass."""
    from blazingsql_spark.functions.text import train_bpe

    df = spark.createDataFrame([(1, "aaaa aaaa aaaa")], ["doc_id", "text"])
    merges, vocab_df = train_bpe(df, n_merges=2)
    assert merges == [("a", "a"), ("aa", "aa")]
    vocab = {r.symbol: r.freq for r in vocab_df.collect()}
    assert vocab == {"aaaa": 3}


def test_bpe_encode_matches_training_state(spark):
    """Encoding the TRAINING corpus with the trained merges must
    reproduce the trainer's own final symbol stream (same greedy
    semantics), and unseen words must still encode via partial merges."""
    from blazingsql_spark.functions.text import bpe_encode, train_bpe

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(40)
    merges, vocab_df = train_bpe(docs, n_merges=6)
    enc = bpe_encode(docs, merges)
    # per-symbol totals over the encoded corpus == trainer's vocab freqs
    got = {
        r.symbol: r.freq
        for r in enc.select(F.explode("tokens").alias("symbol"))
        .groupBy("symbol")
        .agg(F.count("*").cast("long").alias("freq"))
        .collect()
    }
    want = {r.symbol: r.freq for r in vocab_df.collect()}
    assert got == want
    # unseen text: every output symbol is a substring chain of the word
    new = spark.createDataFrame([(99, "zzzunseen word")], ["doc_id", "text"])
    toks = bpe_encode(new, merges).first().tokens
    assert "".join(toks) == "zzzunseenword"


def test_profile_skew_flags_hot_key(spark):
    """A 1000x hot key must surface first with the right share and a
    salt suggestion > 1 at a small target; uniform keys suggest 1."""
    from blazingsql_spark.operators.profile import profile_skew

    hot = spark.range(10_000).selectExpr("'hot' AS k", "id")
    cold = spark.range(100).selectExpr("concat('c', id) AS k", "id AS id2").selectExpr("k", "id2 AS id")
    df = hot.union(cold)
    prof = profile_skew(df, ["k"], top_k=3, target_rows_per_task=4000).collect()
    assert prof[0].k == "hot" and prof[0].key_rows == 10_000
    assert abs(prof[0].row_share - 10_000 / 10_100) < 1e-6
    assert prof[0].suggested_salt == 3  # ceil(10000/4000)
    assert prof[1].suggested_salt == 1
    assert prof[0].n_distinct_keys == 101


def test_bpe_encode_unicode_whitespace_parity(spark):
    """Java regex \\s is ASCII-only, so the trainer treats 'foo\\u00a0bar'
    as ONE word; the encoder must split identically (re.ASCII) or the
    encoded symbol stream desynchronizes from the trained vocabulary."""
    from blazingsql_spark.functions.text import bpe_encode, train_bpe

    df = spark.createDataFrame(
        [(1, "aa\u00a0bb aa\u00a0bb cc cc")], ["doc_id", "text"]
    )
    merges, vocab_df = train_bpe(df, n_merges=4)
    got = {
        r.symbol: r.freq
        for r in bpe_encode(df, merges)
        .select(F.explode("tokens").alias("symbol"))
        .groupBy("symbol")
        .agg(F.count("*").cast("long").alias("freq"))
        .collect()
    }
    want = {r.symbol: r.freq for r in vocab_df.collect()}
    assert got == want
    # and the NBSP really stayed inside one word on both sides
    assert any("\u00a0" in sym for sym in want)


def test_profile_skew_multi_column_keys(spark):
    from blazingsql_spark.operators.profile import profile_skew

    df = spark.range(600).selectExpr(
        "CASE WHEN id < 500 THEN 'a' ELSE 'b' END AS k1",
        "CAST(id % 2 AS STRING) AS k2",
    )
    prof = profile_skew(df, ["k1", "k2"], top_k=4, target_rows_per_task=100).collect()
    assert (prof[0].k1, prof[0].k2) in {("a", "0"), ("a", "1")}
    assert prof[0].key_rows == 250 and prof[0].suggested_salt == 3
    assert prof[0].n_distinct_keys == 4


def test_gopher_repetition_flags_repetitive_docs(spark):
    """A document that is one line repeated, and one dominated by a single
    2-gram, must be flagged; diverse text passes. Empty-gram docs (single
    token) get top_2gram_frac 0.0 via the left join."""
    from blazingsql_spark.functions.text import gopher_repetition

    df = spark.createDataFrame(
        [
            (1, "spam line\nspam line\nspam line\nspam line"),
            (2, "buy now buy now buy now buy now buy now"),
            (3, "a genuinely varied document with many different words here"),
            (4, "single"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in gopher_repetition(df).collect()}
    assert rows[1].dup_line_frac == 0.75 and rows[1].repetition_ok is False
    # doc 2: 2-grams = [buy now]*5 + [now buy]*4 -> top 5/9
    assert abs(rows[2].top_2gram_frac - 5 / 9) < 1e-6
    assert rows[2].repetition_ok is False
    assert rows[3].repetition_ok is True
    assert rows[4].top_2gram_frac == 0.0 and rows[4].n_lines == 1


def test_nfc_normalize_composes_combining_marks(spark):
    """NFC must compose e + COMBINING ACUTE into é and leave composed
    text untouched; nulls stay null."""
    from blazingsql_spark.functions.text import nfc_normalize

    decomposed = "étude"  # NFD
    composed = "étude"     # NFC
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, None)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r.text_nfc for r in nfc_normalize(df).collect()}
    assert rows[1] == composed and rows[2] == composed and rows[3] is None


def test_tfidf_topk_ranks_distinctive_terms_first(spark):
    """A term unique to one document must outrank corpus-wide terms in
    that document; ranks are dense 1..k with (score desc, token asc)
    ties."""
    from blazingsql_spark.functions.text import tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "shared quantum quantum"),
            (2, "shared shared shared"),
            (3, "shared words words"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_topk(df, k=2)
    d1 = [r.token for r in out.filter("doc_id = 1").orderBy("rank").collect()]
    # quantum: tf=2, df=1 -> 2*(ln(4/2)+1)=3.39; shared: tf=1, df=3 -> 1.0
    assert d1[0] == "quantum"
    ranks = [r.rank for r in out.filter("doc_id = 1").orderBy("rank").collect()]
    assert ranks == [1, 2]


def test_html_strip_tags_entities_whitespace(spark):
    from blazingsql_spark.functions.text import html_strip

    df = spark.createDataFrame(
        [
            (1, "<p>Hello <b>world</b></p>\n\n<div>bye</div>"),
            (2, "a &amp;lt; b &nbsp; c&#39;s &quot;x&quot; &lt;tag&gt;"),
            (3, "plain text"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.text_clean for r in html_strip(df).collect()}
    assert got[1] == "Hello world bye"
    # &amp;lt; must unescape to the LITERAL '&lt;', never to '<'
    assert got[2] == "a &lt; b c's \"x\" <tag>"
    assert got[3] == "plain text"


def test_triangle_count_known_graphs(spark):
    from blazingsql_spark.operators.graph import triangle_count

    # K4 has C(4,3)=4 triangles; edges given unordered/duplicated/with a
    # self-loop and a dangling pendant edge — canonicalization handles all
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    edges = spark.createDataFrame(
        k4 + [(2, 2), (0, 9)], ["src", "dst"]
    )
    assert triangle_count(edges).first().n_triangles == 4
    # triangle-free: a path graph
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    assert triangle_count(path).first().n_triangles == 0


def test_semantic_dedup_clustered_vs_exact(spark):
    """SemDeDup production path: the clustered keep-set must (a) drop
    every injected exact copy (identical vectors always share a cluster),
    and (b) equal a numpy brute-force of the same within-cluster
    lower-id rule."""
    import numpy as np

    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionAll(dups)
    kept = {
        r.vec_id
        for r in similarity.semantic_dedup_keep(
            corpus, n_clusters=8, threshold=0.95, dim=64
        ).collect()
    }
    n_dups = dups.count()
    assert n_dups > 0
    # every injected copy has its identical lower-id original in-cluster
    assert all(r.vec_id + 100000 not in kept for r in emb.collect() if r.vec_id % 50 == 0)

    # numpy brute force of the identical rule on the identical clusters
    cents = similarity.ivf_train_centroids(corpus, k=8, dim=64)
    assigned = similarity.assign_to_centroids(corpus, cents, "vec_id", "embedding")
    rows = assigned.select("centroid_id", "vec_id", "embedding").collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.centroid_id, []).append((r.vec_id, np.array(r.embedding, dtype=np.float64)))
    want = set()
    for members in by_cluster.values():
        members.sort()
        for i, (vid, v) in enumerate(members):
            drop = False
            for vjd, u in members[:i]:
                cos = float(v @ u / (np.linalg.norm(v) * np.linalg.norm(u)))
                if round(cos, 6) >= 0.95:
                    drop = True
                    break
            if not drop:
                want.add(vid)
    assert kept == want


def test_ivf_int8_probe_all_matches_float_ranking(spark):
    """With every list probed the candidate set is the full corpus, so the
    int8 tier's divergence from exact float cosine top-k is pure
    quantization rank-flip — on the fixture it must agree on the
    self-match and lose at most a small recall margin."""
    from blazingsql_spark.functions import similarity

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    }
    int8 = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_int8_topk(
            emb, queries, k=5, n_centroids=4, n_probe=4
        ).collect()
    }
    for qid in {q for q, _ in exact}:
        assert (qid, qid) in int8  # self-match survives quantization
    recall = len(exact & int8) / len(exact)
    assert recall >= 0.9, recall


def test_ivf_int8_zero_vector_excluded_not_crashing(spark):
    """All-zero vectors have no cosine direction: they must be EXCLUDED
    from the index (NULL routing) rather than crash ANSI mode with
    DIVIDE_BY_ZERO, and real vectors must still rank exactly."""
    from blazingsql_spark.functions import similarity

    rows = [
        (0, [0.0] * 8),
        (1, [1.0] + [0.0] * 7),
        (2, [0.9, 0.1] + [0.0] * 6),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = spark.createDataFrame([(100, [1.0] + [0.0] * 7)], ["query_id", "embedding"])
    got = similarity.ivf_int8_topk(df, q, k=3, n_centroids=2, n_probe=2, dim=8).collect()
    by_rank = {r.rank: (r.vec_id, r.int8_sim) for r in got}
    assert by_rank[1][0] == 1 and abs(by_rank[1][1] - 1.0) < 1e-4
    assert by_rank[2][0] == 2
    assert 3 not in by_rank  # the zero vector is not indexable
    # a zero-vector QUERY likewise returns no rows instead of raising
    zq = spark.createDataFrame([(200, [0.0] * 8)], ["query_id", "embedding"])
    assert similarity.ivf_int8_topk(df, zq, k=3, n_centroids=2, n_probe=2, dim=8).count() == 0


def _skewed_embedding_fixture(spark, n_mass=200, n_spread=200, dim=8):
    """Deliberately skewed embedding corpus: half the vectors piled near one
    direction (k-means will dump them into one oversized cluster), half
    spread uniformly. Seeded numpy — deterministic."""
    import numpy as np

    rng = np.random.default_rng(7)
    mass = rng.normal([5.0] + [0.0] * (dim - 1), 0.05, size=(n_mass, dim))
    spread = rng.normal(0.0, 1.0, size=(n_spread, dim))
    rows = [
        (int(i), [float(x) for x in v])
        for i, v in enumerate(list(mass) + list(spread))
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semantic_dedup_bounded_balanced_is_exactly_unbounded(spark):
    """With every cluster under the cap, the bounded path must take the
    k*=0 (whole-cluster) branch for every row and reproduce the unbounded
    keep-set EXACTLY — the bound spends recall only where it must."""
    from blazingsql_spark.functions import similarity

    df = _skewed_embedding_fixture(spark, n_mass=30, n_spread=90)
    unbounded = {
        r.vec_id
        for r in similarity.semantic_dedup_keep(
            df, n_clusters=4, threshold=0.95, dim=8, max_cluster_size=None
        ).collect()
    }
    bounded = {
        r.vec_id
        for r in similarity.semantic_dedup_keep(
            df, n_clusters=4, threshold=0.95, dim=8, max_cluster_size=10_000
        ).collect()
    }
    assert bounded == unbounded


def test_semantic_dedup_bounded_skewed_cap_enforced(spark):
    """Skewed fixture (half the corpus near one centroid): every
    hyperplane-split group must sit strictly under the cap, and the
    bounded keep-set must be a SUPERSET of the unbounded one (splitting
    only removes comparisons, so it can only drop fewer rows)."""
    from blazingsql_spark.functions import similarity

    cap = 40
    df = _skewed_embedding_fixture(spark)
    cents = similarity.ivf_train_centroids(df, k=4, dim=8)
    assigned = similarity.assign_to_centroids(df, cents, "vec_id", "embedding")
    # precondition: the fixture really is skewed past the cap
    biggest = max(
        r["count"] for r in assigned.groupBy("centroid_id").count().collect()
    )
    assert biggest > cap
    keyed = similarity._bounded_cluster_keys(
        assigned, cap, "vec_id", "embedding", 8, split_bits=8
    )
    grp_sizes = {r["__grp"]: r["count"] for r in keyed.groupBy("__grp").count().collect()}
    assert keyed.count() == df.count()  # rewrite loses no rows
    assert max(grp_sizes.values()) <= cap
    # rows from under-cap clusters keep their bare centroid key (no '.')
    assert any("." not in g and "#" not in g for g in grp_sizes)

    unbounded = {
        r.vec_id
        for r in similarity.semantic_dedup_keep(
            df, n_clusters=4, threshold=0.95, dim=8, max_cluster_size=None
        ).collect()
    }
    bounded = {
        r.vec_id
        for r in similarity.semantic_dedup_keep(
            df, n_clusters=4, threshold=0.95, dim=8, max_cluster_size=cap
        ).collect()
    }
    assert bounded >= unbounded


def test_semantic_dedup_bounded_point_mass_salts(spark):
    """A point mass of IDENTICAL vectors shares every hyperplane bit, so no
    geometric split can separate it — the salting fallback must still hold
    every group under the cap (deterministic seed, so this stays stable)
    and still collapse each salt bucket to its lowest id."""
    from blazingsql_spark.functions import similarity

    cap = 40
    rows = [(i, [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]) for i in range(300)]
    rows += [(300 + i, [float(i + 1), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -5.0]) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = similarity.ivf_train_centroids(df, k=2, dim=8)
    assigned = similarity.assign_to_centroids(df, cents, "vec_id", "embedding")
    keyed = similarity._bounded_cluster_keys(
        assigned, cap, "vec_id", "embedding", 8, split_bits=8
    )
    grp_sizes = {r["__grp"]: r["count"] for r in keyed.groupBy("__grp").count().collect()}
    assert max(grp_sizes.values()) <= cap
    salted = [g for g in grp_sizes if "#" in g]
    assert salted, "the point mass must have hit the salting fallback"
    kept = similarity.semantic_dedup_keep(
        df, n_clusters=2, threshold=0.95, dim=8, max_cluster_size=cap
    )
    n_kept_mass = kept.filter(F.col("vec_id") < 300).count()
    # each non-empty salt bucket keeps exactly its lowest id
    assert n_kept_mass == len(salted)
    assert 0 in {r.vec_id for r in kept.collect()}


def test_margin_mine_prefers_standout_pairs_over_hubs(spark):
    """A planted exact-duplicate pair must mine with the highest margin,
    while a hub vector (near everything on its side) must NOT beat it —
    the entire point of the ratio margin vs raw cosine."""
    import math
    import random

    from blazingsql_spark.functions import similarity

    rnd = random.Random(7)

    def unit(seedvec):
        n = math.sqrt(sum(v * v for v in seedvec))
        return [v / n for v in seedvec]

    dim = 8
    base = [unit([rnd.gauss(0, 1) for _ in range(dim)]) for _ in range(12)]
    planted = base[0]
    hub = unit([sum(v[i] for v in base[1:]) for i in range(dim)])
    a_rows = [(0, planted), (1, hub)] + [(2 + i, base[2 + i]) for i in range(4)]
    b_rows = [(100, planted)] + [(101 + i, base[6 + i]) for i in range(5)]
    a = spark.createDataFrame(a_rows, ["vec_id", "embedding"])
    b = spark.createDataFrame(b_rows, ["vec_id", "embedding"])
    got = {r.src_id: (r.dst_id, r.margin) for r in
           similarity.margin_mine(a, b, k=3, threshold=0.0).collect()}
    assert got[0][0] == 100  # the planted duplicate is src 0's best pair
    assert got[0][1] > 1.0  # and it stands out of its neighborhoods
    if 1 in got:  # the hub's best margin must not rival the planted pair
        assert got[1][1] < got[0][1]


def test_bloom_membership_no_false_negatives(spark):
    """Bloom screen invariants: every inserted content probes maybe_dup
    (NO false negatives, the guarantee the incremental-ingest shortcut
    rests on); results are identical at any partitioning (deterministic
    md5-derived bits, no library hash mix); and the false-positive rate
    on novel content stays near the designed (1-e^(-kn/m))^k."""
    hist = spark.createDataFrame(
        [(i, f"known document number {i}") for i in range(500)],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(i, f"known document number {i}") for i in range(500)]
        + [(1000 + i, f"novel document number {i}") for i in range(500)],
        ["doc_id", "text"],
    )
    bloom = dedup.bloom_build(hist, n_bits=1 << 14, n_hashes=4)
    got = {
        r.doc_id: r.maybe_dup
        for r in dedup.bloom_probe(batch, bloom, n_bits=1 << 14, n_hashes=4).collect()
    }
    assert all(got[i] for i in range(500))  # no false negative, ever
    fps = sum(1 for i in range(500) if got[1000 + i])
    # k=4, n=500, m=16384 -> p_fp ~ (1-e^(-4*500/16384))^4 ~ 1.7e-4;
    # 500 draws -> expect ~0. Allow slack without letting brokenness pass.
    assert fps <= 5, fps
    again = {
        r.doc_id: r.maybe_dup
        for r in dedup.bloom_probe(
            batch.repartition(7), dedup.bloom_build(hist.repartition(3), n_bits=1 << 14, n_hashes=4),
            n_bits=1 << 14, n_hashes=4,
        ).collect()
    }
    assert again == got


def test_exact_dedup_keep_best_string_and_big_ids(spark):
    """Tie-break must work for NON-numeric ids and for int64 ids past
    double's 2^53 integer cliff (ADVICE r7: the old negate-and-cast-to-
    double spelling failed analysis on strings and mis-ranked huge ids)."""
    s = spark.createDataFrame(
        [("docB", "same", 1.0), ("docA", "same", 1.0), ("docC", "same", 0.5)],
        ["doc_id", "text", "score"],
    )
    row = dedup.exact_dedup_keep_best(s, "score").first()
    assert row.keep_id == "docA" and row.n_dups == 3 and row.best_score == 1.0

    base = 2**53  # 9007199254740992: base+1 and base+2 collide as doubles
    b = spark.createDataFrame(
        [(base + 2, "same", 1.0), (base + 1, "same", 1.0)],
        ["doc_id", "text", "score"],
    )
    assert dedup.exact_dedup_keep_best(b, "score").first().keep_id == base + 1


def test_semantic_dedup_bounded_registry_row_never_salts(spark):
    """The dedup_semantic_bounded registry row's DuckDB oracle reproduces
    the bisection prefixes but NOT the salting fallback (xxhash-free SQL
    can't), so its correctness contract requires that salting stays out of
    reach on the fixture corpora: cap 400 / split_bits 10 against dup
    groups of size 2 can never leave a group over the cap unsplit. Assert
    no '#' key at the driver SF (and by the same construction at sf0.001 /
    sf0.1, whose corpora only grow the bisectable spread)."""
    from blazingsql_spark.functions import similarity
    from blazingsql_spark.queries.registry import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding"
    )
    dups = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    assigned = emb.unionAll(dups).select(
        "vec_id", "embedding", F.lit(0).cast("long").alias("centroid_id")
    )
    keyed = similarity._bounded_cluster_keys(
        assigned, 400, "vec_id", "embedding", 64, split_bits=10
    )
    sizes = keyed.groupBy("__grp").count().collect()
    assert max(r["count"] for r in sizes) <= 400
    assert not any("#" in r["__grp"] for r in sizes)


def test_new_text_ops_edge_documents(spark):
    """Empty, whitespace-only, single-token, and unicode docs must flow
    through gopher/tfidf/html/nfc without crashes and with sane values."""
    from blazingsql_spark.functions.text import (
        gopher_repetition,
        html_strip,
        nfc_normalize,
        tfidf_topk,
    )

    df = spark.createDataFrame(
        [
            (1, ""),
            (2, "   \n  \n "),
            (3, "sólo"),
            (4, "naïve café naïve café naïve café"),
            (5, None),
        ],
        ["doc_id", "text"],
    )
    g = {r.doc_id: r for r in gopher_repetition(df.filter("text IS NOT NULL")).collect()}
    assert g[1].n_lines == 0 and g[1].top_2gram_frac == 0.0
    assert g[2].n_lines == 0
    assert g[3].top_2gram_frac == 0.0  # single token, no 2-grams
    assert g[4].top_2gram_frac > 0.3   # 'naïve café' dominates
    t = tfidf_topk(df.filter("text IS NOT NULL"))
    assert t.filter("doc_id IN (1, 2)").count() == 0  # no tokens, no rows
    assert t.filter("doc_id = 3").count() == 1
    h = {r.doc_id: r.text_clean for r in html_strip(df.filter("text IS NOT NULL")).collect()}
    assert h[1] == "" and h[2] == "" and h[3] == "sólo"
    n = {r.doc_id: r.text_nfc for r in nfc_normalize(df).collect()}
    assert n[5] is None and n[3] == "sólo"


def test_quantize_int8_fidelity_and_edges(spark):
    import numpy as np
    import pandas as pd

    from blazingsql_spark.functions import similarity

    rng = np.random.default_rng(7)
    vecs = [rng.standard_normal(64).astype("float32").tolist() for _ in range(50)]
    rows = [(i, v) for i, v in enumerate(vecs)] + [(99, [0.0] * 64)]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]})
    )
    out = similarity.quantize_int8(df)
    assert dict(out.dtypes)["qvec"] == "array<tinyint>"
    got = {r.vec_id: r for r in out.collect()}
    # all-zero vector: scale 0, zero codes, zero error — no NaN from 0/0
    z = got[99]
    assert z.scale == 0.0 and all(q == 0 for q in z.qvec) and z.recon_mae == 0.0
    for i, v in enumerate(vecs):
        r = got[i]
        x = np.array(v, dtype=np.float64)
        deq = np.array(r.qvec, dtype=np.float64) * r.scale
        cos = float(x @ deq / (np.linalg.norm(x) * np.linalg.norm(deq)))
        assert cos > 0.999, (i, cos)  # int8 keeps cosine within 0.1%
        assert np.max(np.abs(np.array(r.qvec))) <= 127
        assert abs(r.recon_mae - float(np.abs(deq - x).mean())) < 1e-9


def test_unigram_seed_counts_manual(spark):
    from blazingsql_spark.functions.text import unigram_seed_counts

    df = spark.createDataFrame([(1, "abc abc ab")], ["doc_id", "text"])
    got = {r.piece: r.piece_count for r in unigram_seed_counts(df, top_n=10).collect()}
    # "abc" x2 contributes ab/bc/abc x2; "ab" x1 contributes ab x1
    assert got == {"ab": 3, "bc": 2, "abc": 2}


def test_unigram_train_learns_repeated_pieces(spark):
    """The EM loop must concentrate probability on genuinely repeated
    multi-char pieces, keep every single char segmentable, and decrease
    corpus NLL monotonically when no pruning happens between iterations
    (seed == target vocab; plain-EM monotonicity holds exactly then)."""
    from blazingsql_spark.functions.text import train_unigram, unigram_encode

    rows = [(i, "banana band ana nab banana") for i in range(50)] + [
        (100 + i, "cadcad cad dac") for i in range(30)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pieces, nlls = train_unigram(
        df, vocab_size=20, em_iters=3, max_piece_len=4, seed_multiplier=1
    )
    lp = {r.piece: r.logp for r in pieces.collect()}
    assert "ana" in lp and "cad" in lp
    assert lp["ana"] > lp["a"]  # the repeated trigram beats its chars
    assert all(nlls[i + 1] <= nlls[i] + 1e-6 for i in range(len(nlls) - 1)), nlls
    # every char of the corpus is segmentable -> encode reconstructs
    enc = unigram_encode(
        spark.createDataFrame([(1, "banana cadcad")], ["doc_id", "text"]), pieces
    ).first()
    assert "".join(enc.pieces) == "bananacadcad"


def test_unigram_viterbi_matches_exhaustive(spark):
    """Viterbi must achieve the exact optimum: for short words, enumerate
    EVERY segmentation and compare total log-prob; reconstruction must
    hold even with unknown characters."""
    import itertools
    import random

    from blazingsql_spark.functions.text import _viterbi_segment

    rnd = random.Random(11)
    alphabet = "abcd"
    for _ in range(40):
        vocab = {"a": -2.0, "b": -2.2, "c": -2.4, "d": -2.6}
        for _ in range(6):
            ln = rnd.randint(2, 3)
            piece = "".join(rnd.choice(alphabet) for _ in range(ln))
            vocab[piece] = -rnd.uniform(0.5, 3.0)
        word = "".join(rnd.choice(alphabet + "z") for _ in range(rnd.randint(1, 7)))
        segs, score = _viterbi_segment(word, vocab, 8)
        assert "".join(segs) == word
        best = -float("inf")
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            s = 0.0
            ok = True
            for a, b in zip(pos, pos[1:]):
                p = word[a:b]
                if p in vocab:
                    s += vocab[p]
                elif len(p) == 1:
                    s += -1e9
                else:
                    ok = False
                    break
            if ok:
                best = max(best, s)
        assert abs(score - best) < 1e-9, (word, score, best)


def test_unigram_encode_distinct_word_path_is_order_stable(spark):
    from blazingsql_spark.functions.text import train_unigram, unigram_encode

    df = spark.createDataFrame(
        [(i, "alpha beta alpha gamma") for i in range(20)], ["doc_id", "text"]
    )
    pieces, _ = train_unigram(df, vocab_size=30, em_iters=2)
    doc = spark.createDataFrame(
        [(1, "beta alpha gamma beta")], ["doc_id", "text"]
    )
    a = unigram_encode(doc, pieces).first().pieces
    b = unigram_encode(doc.repartition(5), pieces).first().pieces
    assert a == b
    assert "".join(a) == "betaalphagammabeta"  # document order preserved


def test_kn_bigram_perplexity_semantics(spark):
    """KN bigram scoring: a document made of the corpus's dominant bigram
    chain must score LOWER (more predictable) than one made of bigrams
    seen only once; probabilities stay in (0,1) so scores are positive."""
    from blazingsql_spark.functions.text import kn_bigram_negative_logprob

    rows = [(i, "the quick brown fox jumps over") for i in range(30)]
    rows += [(100, "zeta omega prime nebula quartz vector")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in kn_bigram_negative_logprob(df).collect()}
    assert got[0].n_bigrams == 5 and got[100].n_bigrams == 5
    assert 0 < got[0].avg_neg_logprob < got[100].avg_neg_logprob
    # identical docs score identically (pure function of corpus + content)
    assert got[0].avg_neg_logprob == got[29].avg_neg_logprob


def test_kn_trigram_perplexity_semantics(spark):
    """KN trigram tier: the dominant trigram chain scores lowest; a NOVEL
    continuation of a COMMON history ('the quick' → 'fox') scores highest
    — more surprising than wholly-unique text, whose singleton histories
    are trivially predictable. That history-conditioning is exactly what
    the trigram tier buys over unigram frequency scoring."""
    from blazingsql_spark.functions.text import kn_trigram_negative_logprob

    rows = [(i, "the quick brown fox jumps over") for i in range(30)]
    # common histories ('the quick', 'brown fox') with novel continuations
    rows += [(200, "the quick fox brown fox jumps")]
    rows += [(100, "zeta omega prime nebula quartz vector")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in kn_trigram_negative_logprob(df).collect()}
    assert got[0].n_trigrams == 4 and got[100].n_trigrams == 4
    assert 0 < got[0].avg_neg_logprob < got[100].avg_neg_logprob
    assert got[100].avg_neg_logprob < got[200].avg_neg_logprob
    assert got[0].avg_neg_logprob == got[29].avg_neg_logprob


def test_logistic_fit_converges_and_separates(spark):
    """IRLS must drive the data log-loss down monotonically and recover a
    decision boundary that separates a noisy two-feature mixture well;
    prediction is the same sigmoid the trainer used."""
    import random

    from blazingsql_spark.functions.ml import logistic_fit, logistic_predict

    rnd = random.Random(3)
    rows = []
    for i in range(600):
        y = i % 2
        x1 = rnd.gauss(1.5 if y else -1.5, 1.0)
        x2 = rnd.gauss(-1.0 if y else 1.0, 1.0)
        rows.append((float(x1), float(x2), float(y)))
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    fit = logistic_fit(df, ["x1", "x2"], "y", iters=6, l2=1e-3)
    assert fit["n"] == 600
    assert all(
        fit["nll"][i + 1] <= fit["nll"][i] + 1e-9 for i in range(len(fit["nll"]) - 1)
    ), fit["nll"]
    assert fit["weights"]["x1"] > 0 > fit["weights"]["x2"]
    scored = logistic_predict(df, fit, "p")
    acc = scored.filter(
        ((F.col("p") >= 0.5) & (F.col("y") == 1.0))
        | ((F.col("p") < 0.5) & (F.col("y") == 0.0))
    ).count()
    assert acc / 600 > 0.9
    # scoring is a pure projection: partitioning cannot change anything
    a = sorted(r.p for r in scored.limit(10).collect())
    b = sorted(r.p for r in logistic_predict(df.repartition(7), fit, "p").limit(10).collect())
    assert len(a) == len(b) == 10


def test_keep_best_null_and_nan_scores(spark):
    """NULL-score rows must never win the keep slot (struct-ordering NULLs
    sort first and would); NaN wins exactly when max() calls NaN best, so
    keep_id and best_score stay consistent."""
    s = spark.createDataFrame(
        [(1, "t", None), (2, "t", 0.9), (3, "t", 0.1)],
        "doc_id long, text string, score double",
    )
    row = dedup.exact_dedup_keep_best(s, "score").first()
    assert row.keep_id == 2 and row.best_score == 0.9

    nan = float("nan")
    s2 = spark.createDataFrame(
        [(1, "t", 0.9), (2, "t", nan)], "doc_id long, text string, score double"
    )
    row2 = dedup.exact_dedup_keep_best(s2, "score").first()
    import math

    assert row2.keep_id == 2 and math.isnan(row2.best_score)


def test_bloom_probe_duplicate_ids_and_null_text(spark):
    """A duplicated doc_id must not read as a miss (sum==n_hashes broke
    this — a false negative), and NULL texts probe definitely-new
    instead of vanishing or yielding NULL."""
    hist = spark.createDataFrame([(1, "known text")], ["doc_id", "text"])
    bloom = dedup.bloom_build(hist, n_bits=1 << 12)
    batch = spark.createDataFrame(
        [(7, "known text"), (7, "known text"), (8, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.maybe_dup for r in
           dedup.bloom_probe(batch, bloom, n_bits=1 << 12).collect()}
    assert got == {7: True, 8: False}


def test_semantic_dedup_bounded_null_vector_rows_survive(spark):
    """NULL / null-element / odd-length vectors have NULL cosine to
    everything, so the bounded numpy pairwise stage must keep them (and
    not crash on ragged input) — matching the SQL-fold semantics."""
    from blazingsql_spark.functions import similarity

    import random

    rnd = random.Random(5)
    rows = [
        (i, [rnd.gauss(0.0, 1.0) for _ in range(4)]) for i in range(10)
    ]
    rows += [(100, [5.0, 1.0, 2.0, 3.0]), (101, [5.0, 1.0, 2.0, 3.0])]  # dup pair
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    weird = spark.createDataFrame(
        [(200, None), (201, [1.0, None, 2.0, 3.0]), (202, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = df.unionByName(weird)
    kept = {
        r.vec_id
        for r in similarity.semantic_dedup_keep(
            corpus, n_clusters=1, threshold=0.95, dim=4,
            max_cluster_size=6, split_bits=6,
        ).collect()
    }
    assert {200, 201, 202} <= kept  # null-ish rows always survive
    assert 100 in kept and 101 not in kept  # the real dup still collapses


def test_blocklist_filter_subdomain_semantics(spark):
    from blazingsql_spark.functions.web import blocklist_filter, host_suffixes

    df = spark.createDataFrame(
        [
            (1, "a.b.evil.com"),
            (2, "evil.com"),
            (3, "notevil.com"),   # suffix STRING but not suffix DOMAIN
            (4, "good.org"),
            (5, None),            # NULL host is never blocked
        ],
        "doc_id long, host string",
    )
    bl = spark.createDataFrame([("evil.com",)], ["domain"])
    kept = {r.doc_id for r in blocklist_filter(df, bl).collect()}
    assert kept == {3, 4, 5}
    blocked = {r.doc_id for r in blocklist_filter(df, bl, keep_blocked=True).collect()}
    assert blocked == {1, 2}
    sfx = df.filter("doc_id = 1").select(
        F.explode(host_suffixes(F.col("host"))).alias("s")
    ).collect()
    assert [r.s for r in sfx] == ["a.b.evil.com", "b.evil.com", "evil.com", "com"]


def test_remove_duplicated_ngram_spans_semantics(spark):
    """Span rewrite: shared boilerplate is cut from every doc carrying it,
    wholly-unique text is untouched, a pure-boilerplate doc rewrites to ''
    (still present — dropping is a separate decision), and surviving
    tokens keep their original order."""
    from blazingsql_spark.functions.dedup import remove_duplicated_ngram_spans

    boiler = "all rights reserved by the site"
    rows = [
        (1, f"alpha beta gamma {boiler} delta epsilon"),
        (2, f"{boiler} one two three four five"),
        (3, boiler),
        (4, "totally unique content nothing shared here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in remove_duplicated_ngram_spans(df, n=3).collect()}
    assert len(got) == 4
    assert got[1].text_clean == "alpha beta gamma delta epsilon"
    assert got[2].text_clean == "one two three four five"
    assert got[3].text_clean == "" and got[3].n_removed == got[3].n_tokens
    assert got[4].text_clean == "totally unique content nothing shared here"
    assert got[4].n_removed == 0
    assert got[1].n_tokens == 11 and got[1].n_removed == 6


def test_pca_fit_transform_recovers_subspace(spark):
    """PCA on a rank-2-dominant synthetic cloud: the top-2 eigenvalues
    dominate, projection preserves pairwise structure, whitening yields
    ~unit variance per component, and the fit is invariant to
    repartitioning (mergeable-sketch combine is order-safe)."""
    import random

    import numpy as np

    from blazingsql_spark.functions.ml import pca_fit, pca_transform

    rnd = random.Random(11)
    d, n = 16, 400
    u = np.zeros(d); u[0] = 3.0
    v = np.zeros(d); v[1] = 2.0
    rows = []
    for i in range(n):
        x = rnd.gauss(0, 1) * u + rnd.gauss(0, 1) * v
        x = x + np.array([rnd.gauss(0, 0.05) for _ in range(d)])
        rows.append((i, [float(c) for c in x]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = pca_fit(df, k=4)
    assert m["n"] == n
    vals = m["eigvals"]
    assert vals[0] > vals[1] > vals[2] and vals[1] > 5 * vals[2]
    # top components align with the planted axes (up to order)
    c01 = {int(np.argmax(np.abs(m["components"][0]))),
           int(np.argmax(np.abs(m["components"][1])))}
    assert c01 == {0, 1}
    # whitened projection has ~unit variance on the informative axes
    proj = pca_transform(df, m, whiten=True).select("proj").toPandas()
    p = np.asarray(proj["proj"].tolist())
    assert abs(float(p[:, 0].var()) - 1.0) < 0.05
    assert abs(float(p[:, 1].var()) - 1.0) < 0.05
    # partition-order invariance of the fit
    m2 = pca_fit(df.repartition(13), k=4)
    assert np.allclose(m["components"], m2["components"], atol=1e-9)
    assert np.allclose(m["eigvals"], m2["eigvals"], atol=1e-9)


def test_cms_sketch_merge_and_never_undercounts(spark):
    """CMS: sketching two halves independently and merging (element-wise
    sum == union of the sparse rows re-grouped) equals sketching the
    whole; point estimates never undercount; a seed-fixed sketch is
    partition-invariant."""
    from blazingsql_spark.functions.sketches import cms_estimate, cms_sketch

    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(400)]
    rows += [(1000 + i, "hot") for i in range(123)]
    df = spark.createDataFrame(rows, ["i", "tok"])
    whole = cms_sketch(df, "tok", width=64, depth=4)
    a = cms_sketch(df.filter(F.col("i") < 200), "tok", width=64, depth=4)
    b = cms_sketch(df.filter(F.col("i") >= 200), "tok", width=64, depth=4)
    merged = a.unionByName(b).groupBy("j", "w").agg(F.sum("c").alias("c"))
    got_w = {(r.j, r.w): r.c for r in whole.collect()}
    got_m = {(r.j, r.w): r.c for r in merged.collect()}
    assert got_w == got_m
    est = cms_estimate(whole, ["a", "hot", "absent"], width=64, depth=4)
    assert est["a"] >= 100 and est["hot"] >= 123
    est2 = cms_estimate(
        cms_sketch(df.repartition(7), "tok", width=64, depth=4),
        ["a", "hot"], width=64, depth=4,
    )
    assert est2 == {k: est[k] for k in ("a", "hot")}


def test_cms_estimate_df_mirrors_build_normalization(spark):
    """cms_estimate_df must hash through the SAME dropna().astype(str)
    path as cms_sketch: NULL items are excluded (not hashed as 'None'),
    and non-string items (ints) land on the build-side cells so the
    distributed estimate equals the driver-side cms_estimate."""
    from blazingsql_spark.functions.sketches import (
        cms_estimate,
        cms_estimate_df,
        cms_sketch,
    )

    # integer-typed item column + NULLs on both sides
    rows = [(i, i % 5) for i in range(300)] + [(900 + i, None) for i in range(7)]
    df = spark.createDataFrame(rows, "i long, tok long")
    sk = cms_sketch(df, "tok", width=64, depth=4)
    items = spark.createDataFrame(
        [(0,), (3,), (None,), (42,)], "tok long"
    )
    got = {
        r["item"]: r["est"]
        for r in cms_estimate_df(sk, items, width=64, depth=4, item_col="tok").collect()
    }
    # NULL item excluded entirely — no phantom 'None' estimate row
    assert None not in got and "None" not in got
    want = cms_estimate(sk, ["0", "3", "42"], width=64, depth=4)
    assert {k: got[k] for k in ("0", "3", "42")} == want
    assert got["0"] >= 60 and got["3"] >= 60


def test_categorical_encode_roundtrip_and_unknowns(spark):
    """Frequency-ordered ids are dense from 0, ties break by value, and
    unseen categories transform to unknown_id instead of dropping rows."""
    from blazingsql_spark.functions.ml import categorical_fit, categorical_transform

    df = spark.createDataFrame(
        [(i, "en") for i in range(5)]
        + [(10 + i, "de") for i in range(3)]
        + [(20 + i, "fr") for i in range(3)],
        ["id", "lang"],
    )
    m = {r.lang: (r.cat_id, r.n) for r in categorical_fit(df, "lang").collect()}
    assert m == {"en": (0, 5), "de": (1, 3), "fr": (2, 3)}  # tie de<fr
    new = spark.createDataFrame([(1, "en"), (2, "zz")], ["id", "lang"])
    got = {
        r.id: r.cat_id
        for r in categorical_transform(new, categorical_fit(df, "lang"), "lang").collect()
    }
    assert got == {1: 0, 2: -1}


def test_tag_phrases_automaton_vs_bruteforce(spark):
    """Aho-Corasick phrase tagging equals per-phrase brute-force counting
    on randomized token streams, including self-overlapping phrases and
    phrases that are prefixes of each other."""
    import random

    from blazingsql_spark.functions.text import tag_phrases

    phrases = ["a b", "b", "a b c", "c c", "b c b"]
    rnd = random.Random(5)
    rows = [
        (i, " ".join(rnd.choice("abcd") for _ in range(rnd.randint(0, 25))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: dict(r.phrase_hits) for r in tag_phrases(df, phrases).collect()}

    def brute(text):
        toks = text.split()
        c = {}
        for p in phrases:
            pt = p.split()
            n = sum(
                1
                for i in range(len(toks) - len(pt) + 1)
                if toks[i : i + len(pt)] == pt
            )
            if n:
                c[p] = n
        return c

    for i, text in rows:
        assert got[i] == brute(text), (i, text)


def test_target_encode_shrinks_rare_categories(spark):
    """Smoothed target encoding: a frequent category's encoding tracks
    its own mean; a 1-row category shrinks nearly all the way to the
    global mean; m=0 recovers the raw per-category mean."""
    from blazingsql_spark.functions.ml import target_encode

    rows = [("big", 10.0)] * 50 + [("rare", 1000.0)]
    df = spark.createDataFrame(rows, ["c", "y"])
    got = {r.c: r for r in target_encode(df, "c", "y", smoothing=10.0).collect()}
    gmean = (50 * 10.0 + 1000.0) / 51
    assert abs(got["big"].enc - 10.0) < abs(gmean - 10.0) * 0.5
    assert abs(got["rare"].enc - (1000.0 + 10 * gmean) / 11) < 1e-9
    raw = {r.c: r.enc for r in target_encode(df, "c", "y", smoothing=0.0).collect()}
    assert abs(raw["big"] - 10.0) < 1e-9 and abs(raw["rare"] - 1000.0) < 1e-9


def test_temperature_weights_upsample_tail(spark):
    """alpha<1 lifts tail domains above their natural share, alpha=1 is
    exactly natural sampling, and weights always sum to 1."""
    from blazingsql_spark.functions.sampling import temperature_weights

    rows = [("en",)] * 90 + [("sw",)] * 10
    df = spark.createDataFrame(rows, ["lang"])
    w3 = {r.lang: r.weight for r in temperature_weights(df, "lang", 0.3).collect()}
    w1 = {r.lang: r.weight for r in temperature_weights(df, "lang", 1.0).collect()}
    assert abs(sum(w3.values()) - 1.0) < 1e-12
    assert abs(w1["en"] - 0.9) < 1e-12 and abs(w1["sw"] - 0.1) < 1e-12
    assert w3["sw"] > 0.1 and w3["en"] < 0.9  # tail upsampled


def test_mmr_rerank_prefers_diverse_results(spark):
    """MMR: the pool's top scores are near-duplicates of each other; plain
    top-k returns the clones, MMR (lam=0.7) returns the top-1 plus the
    distinct direction instead of the remaining clones. First pick always
    equals the plain top-1 (zero penalty on an empty selection)."""
    from blazingsql_spark.functions.similarity import cosine_topk, mmr_rerank

    base = [1.0, 0.0, 0.0, 0.0]
    clone = [0.999, 0.01, 0.0, 0.0]
    clone2 = [0.998, 0.02, 0.0, 0.0]
    other = [0.5, 0.0, 0.86, 0.0]
    far = [0.0, 0.0, 0.0, 1.0]
    rows = [(0, base), (1, clone), (2, clone2), (3, other), (4, far)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pool = cosine_topk(emb, queries, k=5)
    plain = [r.vec_id for r in pool.orderBy("rank").collect()][:3]
    assert plain == [0, 1, 2]  # the clones crowd plain top-3
    got = mmr_rerank(pool, emb, k=3, lam=0.3, mu=0.7).orderBy("mmr_rank").collect()
    picked = [r.vec_id for r in got]
    # first pick == top-1 relevance; then the orthogonal directions beat
    # the near-clones outright (0.3*0.9999 - 0.7*0.9999 < 0.3*rel - 0)
    assert picked == [0, 4, 3]
    # with lam=1 MMR degenerates to plain top-k
    degen = [
        r.vec_id
        for r in mmr_rerank(pool, emb, k=3, lam=1.0, mu=0.0)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert degen == plain


def test_ivf_pca_topk_exact_when_probing_all_lists(spark):
    """PCA-routed IVF: probing every list scans the whole corpus, so the
    full-dim rerank must reproduce brute-force cosine_topk EXACTLY —
    routing space cannot affect the final ranking, only candidate
    selection. A prebuilt pca_fit model (the PcaIngest hand-off) gives
    the same result as self-training."""
    from blazingsql_spark.functions.ml import pca_fit
    from blazingsql_spark.functions.similarity import cosine_topk, ivf_pca_topk
    from blazingsql_spark.queries.registry import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = sorted(
        tuple(r) for r in cosine_topk(emb, queries, k=5).collect()
    )
    got = sorted(
        tuple(r)
        for r in ivf_pca_topk(
            emb, queries, k=5, n_centroids=8, n_probe=8, pca_k=16
        ).collect()
    )
    assert got == want
    model = pca_fit(emb, k=16)
    got2 = sorted(
        tuple(r)
        for r in ivf_pca_topk(
            emb, queries, k=5, n_centroids=8, n_probe=8, pca_k=16, model=model
        ).collect()
    )
    assert got2 == want


def test_wordpiece_trainer_known_example_and_bruteforce(spark):
    """WordPiece merge loop: the canonical hug/pug/hugs example picks
    ##g+##s first (the rare-parts pair, NOT the frequent ##u+##g — the
    likelihood objective that separates WordPiece from BPE), and the
    incremental-count loop matches a from-scratch re-derivation on
    random corpora."""
    import random

    from blazingsql_spark.functions.text import (
        _driver_wordpiece_merges,
        _wp_mark,
    )

    merges, vocab = _driver_wordpiece_merges(
        [("hug", 10), ("pug", 5), ("hugs", 5)], 3
    )
    assert merges[0] == ("##g", "##s")
    assert vocab["##ug"] == 15 and vocab["##ugs"] == 5

    def brute(word_freqs, n_merges):
        syms = {w: _wp_mark(w) for w, _ in word_freqs}
        freqs = dict(word_freqs)
        merges = []
        for _ in range(n_merges):
            counts, symc = {}, {}
            for w, s in syms.items():
                f = freqs[w]
                for x in s:
                    symc[x] = symc.get(x, 0) + f
                for i in range(len(s) - 1):
                    p = (s[i], s[i + 1])
                    counts[p] = counts.get(p, 0) + f
            best, bk = None, None
            for (a, b), c in counts.items():
                k = (-(c / (symc[a] * symc[b])), a, b)
                if bk is None or k < bk:
                    bk, best = k, (a, b)
            if best is None:
                break
            merges.append(best)
            a, b = best
            ns = a + (b[2:] if b.startswith("##") else b)
            for w, s in syms.items():
                out = []
                for x in s:
                    if out and out[-1] == a and x == b:
                        out[-1] = ns
                    else:
                        out.append(x)
                syms[w] = out
        return merges

    rnd = random.Random(17)
    for _ in range(25):
        wf = sorted(
            {
                "".join(rnd.choice("abc") for _ in range(rnd.randint(1, 6))): rnd.randint(1, 9)
                for _ in range(rnd.randint(2, 12))
            }.items()
        )
        got, _ = _driver_wordpiece_merges(wf, 5)
        assert got == brute(wf, 5), wf


def test_wordpiece_fast_heap_equals_scan_oracle():
    """The heap-scheduled merge loop (what train_wordpiece runs) must be
    MERGE-FOR-MERGE and vocab-identical to the O(pairs)-scan reference —
    including the WordPiece wrinkle the heap must handle: scores RISING
    when a denominator symbol's count shrinks. Random corpora over a
    small alphabet maximize symbol sharing, the hard case."""
    import random

    from blazingsql_spark.functions.text import (
        _driver_wordpiece_merges,
        _driver_wordpiece_merges_fast,
    )

    rnd = random.Random(20260815)
    for trial in range(60):
        wf = sorted(
            {
                "".join(
                    rnd.choice("abcd") for _ in range(rnd.randint(1, 8))
                ): rnd.randint(1, 9)
                for _ in range(rnd.randint(2, 25))
            }.items()
        )
        n = rnd.randint(1, 12)
        slow = _driver_wordpiece_merges(wf, n)
        fast = _driver_wordpiece_merges_fast(wf, n)
        assert fast == slow, (trial, wf, n)


def test_wordpiece_fast_heap_32k_merges_is_fast():
    """The point of the heap path (VERDICT r8 item 8): a realistic-vocab
    train with a 32k merge budget completes in seconds, not the
    O(n_merges x pairs) scan's hours. Synthetic Zipf-ish vocab of 20k
    words; the budget self-exhausts when no positive-count pair remains,
    which IS the 32k-budget behavior on a bounded corpus."""
    import random
    import time

    rnd = random.Random(7)
    words = {
        "".join(rnd.choice("abcdefghijklmnop") for _ in range(rnd.randint(2, 12))):
            rnd.randint(1, 1000)
        for _ in range(20_000)
    }
    wf = sorted(words.items())
    from blazingsql_spark.functions.text import _driver_wordpiece_merges_fast

    t0 = time.perf_counter()
    merges, vocab = _driver_wordpiece_merges_fast(wf, 32_000)
    dt = time.perf_counter() - t0
    assert len(merges) > 5_000  # a real merge run, not an early bail
    assert dt < 60, f"32k-merge WordPiece train took {dt:.1f}s"


def test_wordpiece_encode_greedy_and_reconstruction(spark):
    """Greedy longest match takes the longest vocab piece at each
    position; stripped-## pieces reconstruct the word; unencodable words
    become [UNK] whole; the distributed encode round-trips through the
    distinct-word path."""
    from blazingsql_spark.functions.text import train_wordpiece, wordpiece_encode

    df = spark.createDataFrame(
        [(1, "hug hug pug hugs"), (2, "hug pug pug hugs zap")],
        ["doc_id", "text"],
    )
    merges, vocab_df = train_wordpiece(df, n_merges=3)
    vocab = {r.piece for r in vocab_df.collect()}
    # a word with a character never seen in training becomes [UNK] whole
    unseen = wordpiece_encode(
        spark.createDataFrame([(9, "hug qux")], ["doc_id", "text"]), vocab_df
    ).first()
    assert "[UNK]" in unseen.pieces and unseen.pieces.count("[UNK]") == 1
    out = {r.doc_id: r.pieces for r in wordpiece_encode(df, vocab_df).collect()}
    for doc_id, text in [(1, "hug hug pug hugs"), (2, "hug pug pug hugs zap")]:
        words = text.split()
        pieces = out[doc_id]
        # reassemble word-by-word
        rebuilt, cur = [], ""
        for p in pieces:
            if p == "[UNK]":
                if cur:
                    rebuilt.append(cur)
                rebuilt.append(None)
                cur = ""
            elif p.startswith("##"):
                cur += p[2:]
            else:
                if cur:
                    rebuilt.append(cur)
                cur = p
        if cur:
            rebuilt.append(cur)
        assert len(rebuilt) == len(words)
        for w, r in zip(words, rebuilt):
            assert r is None or r == w


def test_wordpiece_distributed_first_merge_matches_driver(spark):
    """The distributed first-merge selection (the vocab_wordpiece_first
    registry row) picks the same pair as the driver merge loop on the
    fixture corpus."""
    from blazingsql_spark.functions.text import train_wordpiece
    from blazingsql_spark.queries.registry import all_queries, load_table
    from tests.conftest import SF_DIR

    row = all_queries()["vocab_wordpiece_first"].fn(spark, SF_DIR).first()
    merges, _ = train_wordpiece(load_table(spark, SF_DIR, "documents"), n_merges=1)
    assert (row.a, row.b) == merges[0]


def test_entity_resolution_merges_transitively(spark):
    """The composed fuzzy-blocking -> components pipeline: every entity
    holds exactly {original, +x, +xx} — the grandchild shares no edge
    with the original, so a 3-member entity proves transitive closure
    (pairwise-only matching would leave 2+1)."""
    from blazingsql_spark.queries.registry import all_queries
    from tests.conftest import SF_DIR

    rows = all_queries()["dedup_entity_resolution"].fn(spark, SF_DIR).collect()
    assert len(rows) == 31
    assert all(r.n_members == 3 for r in rows)


def test_auc_score_matches_pairwise_definition(spark):
    """auc_score (rank-sum with tie correction) equals the O(n^2)
    pairwise definition — concordant + half of tied pairs — on random
    labeled data with heavy score ties; perfect and inverted separations
    hit exactly 1.0 and 0.0."""
    import random

    from blazingsql_spark.functions.ml import auc_score

    rnd = random.Random(23)
    rows = [(rnd.randint(0, 8), rnd.randint(0, 1)) for _ in range(300)]
    df = spark.createDataFrame(rows, ["s", "y"])
    got = auc_score(df, "s", "y").first()
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    pairs = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    want = pairs / (len(pos) * len(neg))
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert abs(got.auc - want) < 1e-12
    perfect = spark.createDataFrame(
        [(i, 1 if i >= 50 else 0) for i in range(100)], ["s", "y"]
    )
    assert auc_score(perfect, "s", "y").first().auc == 1.0
    inverted = spark.createDataFrame(
        [(i, 0 if i >= 50 else 1) for i in range(100)], ["s", "y"]
    )
    assert auc_score(inverted, "s", "y").first().auc == 0.0


def test_bitstring_candidate_pairs_lossless_within_radius(spark):
    """Banded candidate generation over bit-string signatures equals the
    brute-force hamming join for every pair within the pigeonhole radius
    (max_hamming <= bands-1 guarantees a clean band), and the guard
    rejects radii the guarantee cannot cover."""
    import random

    import pytest

    from blazingsql_spark.functions.dedup import bitstring_candidate_pairs

    rnd = random.Random(31)
    sigs = {}
    base = "".join(rnd.choice("01") for _ in range(64))
    sigs[0] = base
    for i in range(1, 12):  # planted neighbors at hamming 1..3
        s = list(base)
        for pos in rnd.sample(range(64), (i % 3) + 1):
            s[pos] = "1" if s[pos] == "0" else "0"
        sigs[i] = "".join(s)
    for i in range(12, 40):  # random far signatures
        sigs[i] = "".join(rnd.choice("01") for _ in range(64))
    df = spark.createDataFrame(sorted(sigs.items()), ["id", "sig"])
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in bitstring_candidate_pairs(df, "sig", "id", bands=4, max_hamming=3).collect()
    }
    want = {}
    ids = sorted(sigs)
    for i in ids:
        for j in ids:
            if i < j:
                h = sum(a != b for a, b in zip(sigs[i], sigs[j]))
                if h <= 3:
                    want[(i, j)] = h
    assert got == want and len(want) >= 11
    with pytest.raises(ValueError, match="pigeonhole"):
        bitstring_candidate_pairs(df, "sig", "id", bands=4, max_hamming=4)


def test_bitstring_pairs_empty_and_null_signatures(spark):
    """Corpus-robustness (ADVICE r8): an empty frame returns an empty
    pair frame (same schema), not a confusing 'found lengths []' error;
    NULL signatures (decode failures under on_error='skip') are excluded
    rather than aborting the job as a mixed-width error."""
    from blazingsql_spark.functions.dedup import bitstring_candidate_pairs

    schema = "id long, sig string"
    empty = spark.createDataFrame([], schema)
    out = bitstring_candidate_pairs(empty, "sig", "id")
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "hamming"]

    with_nulls = spark.createDataFrame(
        [(1, "00000000"), (2, "00000001"), (3, None), (4, None)], schema
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in bitstring_candidate_pairs(
            with_nulls, "sig", "id", bands=4, max_hamming=3
        ).collect()
    }
    assert got == {(1, 2): 1}

    all_null = spark.createDataFrame([(1, None), (2, None)], schema)
    assert bitstring_candidate_pairs(all_null, "sig", "id").count() == 0

    # real width mismatches still fail loudly, naming the widths
    mixed = spark.createDataFrame([(1, "0000"), (2, "00000000")], schema)
    with pytest.raises(ValueError, match=r"\[4, 8\]"):
        bitstring_candidate_pairs(mixed, "sig", "id")


def test_holt_linear_matches_sequential_reference(spark):
    """The expression-fold Holt recursion equals a sequential Python
    reference on random series (level, trend, and h-step forecast);
    single-observation keys are dropped; a perfect linear series
    forecasts exactly on the line."""
    import random

    from blazingsql_spark.operators.stats import holt_linear

    rnd = random.Random(41)
    rows = []
    series = {}
    for k in range(6):
        n = rnd.randint(2, 15)
        ys = [float(rnd.randint(0, 50)) for _ in range(n)]
        series[k] = ys
        rows += [(k, t, ys[t]) for t in range(n)]
    rows.append((99, 0, 5.0))  # singleton: dropped
    df = spark.createDataFrame(rows, ["k", "t", "y"])
    got = {r.k: r for r in holt_linear(df, ["k"], "t", "y", 0.5, 0.3, 3).collect()}
    assert 99 not in got and set(got) == set(series)

    def ref(ys):
        lev, tr = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            nl = 0.5 * y + 0.5 * (lev + tr)
            tr = 0.3 * (nl - lev) + 0.7 * tr
            lev = nl
        return lev, tr

    for k, ys in series.items():
        lev, tr = ref(ys)
        assert got[k].level == lev and got[k].trend == tr, k
        assert got[k].forecast == lev + 3.0 * tr
    # a perfectly linear series: forecast continues the line exactly
    lin = spark.createDataFrame([(0, t, 10.0 + 2.0 * t) for t in range(8)], ["k", "t", "y"])
    r = holt_linear(lin, ["k"], "t", "y", 0.5, 0.3, 3).first()
    assert abs(r.forecast - (10.0 + 2.0 * 10)) < 1e-9


def test_semantic_dedup_default_is_bounded(spark):
    """A caller on DEFAULT settings must get the production bounded path
    (cap 2000) — the O(sum cluster^2) paper-exact path is the explicit
    max_cluster_size=None opt-in, never a silent default (VERDICT r8)."""
    import inspect

    from blazingsql_spark.functions import similarity

    sig = inspect.signature(similarity.semantic_dedup_keep)
    assert sig.parameters["max_cluster_size"].default == 2000
    # and the default produces the same keep-set as the exact path on an
    # under-cap corpus (the k*=0 whole-cluster branch)
    df = _skewed_embedding_fixture(spark, n_mass=20, n_spread=40)
    default_kept = {
        r.vec_id
        for r in similarity.semantic_dedup_keep(
            df, n_clusters=2, threshold=0.95, dim=8
        ).collect()
    }
    exact_kept = {
        r.vec_id
        for r in similarity.semantic_dedup_keep(
            df, n_clusters=2, threshold=0.95, dim=8, max_cluster_size=None
        ).collect()
    }
    assert default_kept == exact_kept


def test_ddsketch_merge_exact_and_accuracy_property(spark):
    """DDSketch (sketches.ddsketch_*): (1) merging per-group sketches is
    EXACTLY the sketch of the union (count addition is the merge
    operator); (2) every quantile estimate is within the configured
    relative accuracy of the exact percentile on a log-uniform sample;
    (3) negative values fail in-scan with a typed message."""
    import math
    import random

    from blazingsql_spark.functions import sketches

    rnd = random.Random(20260815)
    rows = [(math.exp(rnd.uniform(-3, 8)), i % 5) for i in range(4000)]
    rows += [(0.0, 0)] * 7  # zero bucket
    df = spark.createDataFrame(rows, "x double, grp int")

    per_grp = sketches.ddsketch_build(df, "x", ["grp"], relative_accuracy=0.02)
    merged = sketches.ddsketch_merge(per_grp)
    direct = sketches.ddsketch_build(df, "x", relative_accuracy=0.02)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )

    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    est = {
        r.q: r.est
        for r in sketches.ddsketch_quantiles(
            merged, qs, relative_accuracy=0.02
        ).collect()
    }
    xs = sorted(x for x, _ in rows)
    for q in qs:
        exact = xs[min(len(xs) - 1, math.ceil(q * len(xs)) - 1)]
        if exact > 0:
            assert abs(est[q] - exact) / exact <= 0.021, (q, est[q], exact)

    import pytest

    with pytest.raises(ValueError, match="relative_accuracy"):
        sketches.ddsketch_build(df, "x", relative_accuracy=1.5)

    # mirrored negative store: a symmetric signed series estimates
    # signed quantiles within the relative bound on |value|
    signed = spark.createDataFrame(
        [(float(v),) for v in range(-500, 501) if v != 0] + [(0.0,)] * 3,
        "x double",
    )
    ssk = sketches.ddsketch_build(signed, "x", relative_accuracy=0.01)
    sq = {
        r.q: r.est
        for r in sketches.ddsketch_quantiles(
            ssk, [0.05, 0.5, 0.95], relative_accuracy=0.01
        ).collect()
    }
    assert abs(sq[0.05] - (-451.0)) / 451.0 <= 0.011  # rank 51 of -500..-1
    assert abs(sq[0.5]) <= 1.0  # median straddles the zero bucket
    assert abs(sq[0.95] - 452.0) / 452.0 <= 0.011


def test_ddsketch_nulls_excluded(spark):
    """Code-review r9 regression: NULL values must be EXCLUDED from the
    sketch — a NULL-bucket row sorts first in the quantile walk and
    inflates n, silently dragging every estimate toward the minimum."""
    from blazingsql_spark.functions import sketches

    vals = [(float(i),) for i in range(1, 101)] + [(None,)] * 100
    df = spark.createDataFrame(vals, "x double")
    sk = sketches.ddsketch_build(df, "x")
    assert sk.filter("bucket IS NULL").count() == 0
    assert sk.agg(F.sum("cnt")).collect()[0][0] == 100  # nulls not counted
    est = {
        r.q: r.est
        for r in sketches.ddsketch_quantiles(sk, [0.5]).collect()
    }
    assert abs(est[0.5] - 50.0) / 50.0 <= 0.02  # median of 1..100, not ~1


def test_create_table_uint_pandas_nondefault_index(spark):
    """Code-review r9 regression: the pandas-with-uint ingestion path
    routes through Arrow and must NOT leak __index_level_0__ for frames
    with a non-default index (filtered/sorted frames)."""
    import numpy as np
    import pandas as pd

    from blazingsql_spark.context import Context

    pdf = pd.DataFrame(
        {"u": np.array([1, 2, 3, 4], np.uint64), "x": [10, 20, 30, 40]}
    )
    filtered = pdf[pdf.x > 15]  # non-default index 1..3
    bc = Context(spark=spark)
    df = bc.create_table("t_uint_idx", filtered)
    assert df.columns == ["u", "x"]
    assert df.count() == 3


def test_ivf_topk_filtered_no_leaks_and_exact_at_full_probe(spark):
    """Metadata-filtered ANN: (1) results NEVER contain rows the
    predicate excludes (pre-filtering's defining guarantee); (2) with
    every centroid probed it equals the exact filtered top-k row for
    row; (3) the auto probe count widens by the filter's selectivity."""
    import random as _r

    from blazingsql_spark.functions import similarity

    rnd = _r.Random(5)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)], i % 3)
        for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flt = "label = 0"  # ~1/3 selectivity
    bad = {r.vec_id for r in emb.filter(f"NOT ({flt})").collect()}
    # PARTIAL probe (2 of 8 lists): the regime where pre-filter leak
    # safety is non-trivial — a post-filtering regression would slip
    # through a full-probe-only check (results == exact there)
    partial = similarity.ivf_topk_filtered(
        emb, queries, flt, k=5, n_centroids=8, dim=8, n_probe=2
    ).collect()
    assert partial and not ({r.vec_id for r in partial} & bad)
    # auto path: no leaks either
    approx = similarity.ivf_topk_filtered(
        emb, queries, flt, k=5, n_centroids=8, dim=8
    )
    got = approx.collect()
    assert got and not ({r.vec_id for r in got} & bad)  # no leaks

    # full probe == exact filtered top-k, row for row
    full = similarity.ivf_topk_filtered(
        emb, queries, flt, k=5, n_centroids=8, dim=8, n_probe=8
    )
    exact = similarity.cosine_topk(emb.filter(flt), queries, k=5)
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, exact.collect())
    )

    # selectivity widening saturates at this filter (1/3 selectivity,
    # auto_n_probe(8)=4 -> ceil(4/0.33)=12 capped at 8 lists), so the
    # AUTO path must equal the exact filtered top-k row for row — the
    # behavioral assertion of the widening logic, not arithmetic on
    # local variables
    assert sorted(map(tuple, got)) == sorted(map(tuple, exact.collect()))


def test_filtered_serving_hnsw_and_pq_tiers(spark):
    """The filtered-serving facades on the other tiers share
    ivf_topk_filtered's pre-filter contract: (1) no result ever
    violates the predicate (leak-free by construction — the lists /
    encoded table are pruned before rerank); (2) the HNSW route at full
    probe equals the exact filtered top-k (graph routing is exact when
    the beam covers every centroid); (3) PQ stays leak-free at a
    partial probe where post-filtering would slip."""
    import random as _r

    from blazingsql_spark.functions import similarity
    from blazingsql_spark.operators.hnsw import hnsw_ivf_topk_filtered

    rnd = _r.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)], i % 3)
        for i in range(300)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flt = "label = 0"
    bad = {r.vec_id for r in emb.filter(f"NOT ({flt})").collect()}
    exact = sorted(
        map(tuple, similarity.cosine_topk(emb.filter(flt), queries, k=5).collect())
    )

    # HNSW tier: partial probe leak-free; full probe == exact filtered
    part = hnsw_ivf_topk_filtered(
        emb, queries, flt, k=5, n_centroids=8, dim=8, n_probe=2
    ).collect()
    assert part and not ({r.vec_id for r in part} & bad)
    full = hnsw_ivf_topk_filtered(
        emb, queries, flt, k=5, n_centroids=8, dim=8, n_probe=8
    ).collect()
    assert sorted(map(tuple, full)) == exact

    # PQ tier: lossy codes, so assert the leak-free contract + coverage
    # (every query answered with k rows), not exact equality
    pq = similarity.ivfpq_topk_filtered(
        emb, queries, flt, k=5, n_centroids=8, n_probe=3, m=4, ksub=8, dim=8
    ).collect()
    assert pq and not ({r.vec_id for r in pq} & bad)
    per_q = {}
    for r in pq:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert set(per_q.values()) == {5}

    # cached-corpus-count prebuilt shape on the PQ facade
    idx = similarity.ivfpq_build(emb, 8, 4, 8, dim=8)
    n = emb.count()
    pq2 = similarity.ivfpq_topk_filtered(
        emb, queries, flt, k=5, m=4, ksub=8, dim=8,
        n_centroids=8, prebuilt=(*idx, n),
    ).collect()
    assert pq2 and not ({r.vec_id for r in pq2} & bad)


def test_filtered_serving_flat_pq_and_lsh_tiers(spark):
    """Round-11 facade symmetry: the remaining ANN tiers (flat PQ with
    exact rerank, multi-probe LSH) get the same pre-filter serving shape
    as IVF/HNSW/IVF-PQ. Contract: (1) leak-free — no result ever
    violates the predicate (the encoded/signature table is pruned by a
    left-semi join on ids before candidates form); (2) recall vs the
    exact FILTERED top-k holds a floor under a selective filter (these
    tiers scan every surviving row's bucket/codes, so filtering cannot
    degrade relative recall); (3) the prebuilt session-resident index
    shape serves identically."""
    import random as _r

    from blazingsql_spark.functions import similarity

    rnd = _r.Random(11)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)], i % 4)
        for i in range(300)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = emb.filter(F.col("vec_id") % 60 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flt = "label = 0"  # ~1/4 selectivity
    bad = {r.vec_id for r in emb.filter(f"NOT ({flt})").collect()}
    exact = similarity.cosine_topk(emb.filter(flt), queries, k=5).collect()
    exact_pairs = {(r.query_id, r.vec_id) for r in exact}

    def recall(got):
        hit = sum((r.query_id, r.vec_id) in exact_pairs for r in got)
        return hit / len(exact_pairs)

    # flat PQ + rerank: leak-free, recall floor, full pool == exact
    pq = similarity.pq_topk_filtered(
        emb, queries, flt, k=5, m=4, ksub=8, dim=8
    ).collect()
    assert pq and not ({r.vec_id for r in pq} & bad)
    assert recall(pq) >= 0.8, recall(pq)
    # generous pool covers the whole filtered corpus -> exact equality
    pq_full = similarity.pq_topk_filtered(
        emb, queries, flt, k=5, pool=300, m=4, ksub=8, dim=8
    ).collect()
    assert sorted(map(tuple, pq_full)) == sorted(map(tuple, exact))

    # prebuilt index shape
    books = similarity.pq_train_codebooks(emb, m=4, ksub=8, dim=8)
    encoded = similarity.pq_encode(emb, books, m=4, dim=8)
    pq2 = similarity.pq_topk_filtered(
        emb, queries, flt, k=5, m=4, ksub=8, dim=8,
        prebuilt=(books, encoded),
    ).collect()
    assert pq2 and not ({r.vec_id for r in pq2} & bad)
    assert recall(pq2) >= 0.8

    # multi-probe LSH: leak-free + recall floor (bucketed candidates)
    lsh = similarity.ann_lsh_topk_filtered(
        emb, queries, flt, k=5, dim=8, bands=4, bits_per_band=8
    ).collect()
    assert lsh and not ({r.vec_id for r in lsh} & bad)
    assert recall(lsh) >= 0.6, recall(lsh)

    # prebuilt signature table serves identically
    v_sig = similarity.lsh_band_signatures(emb, "embedding", 8, 4, 8)
    lsh2 = similarity.ann_lsh_topk_filtered(
        emb, queries, flt, k=5, dim=8, bands=4, bits_per_band=8,
        prebuilt=(v_sig,),
    ).collect()
    assert sorted(map(tuple, lsh2)) == sorted(map(tuple, lsh))


def test_prefilter_flt_ids_cache_evicts_previous(spark):
    """r12 (ADVICE r11): repeated filtered-serving calls must not
    accumulate cached filtered-id frames in executor storage — each
    _prefilter_plan call that caches evicts the PREVIOUS call's cached
    frame, bounding the session to at most one."""
    import random as _r

    from blazingsql_spark.functions import similarity

    rnd = _r.Random(7)
    emb = spark.createDataFrame(
        [(i, [rnd.uniform(-1, 1) for _ in range(4)], i % 2)
         for i in range(60)],
        "vec_id long, embedding array<float>, label int",
    )
    first, _np1 = similarity._prefilter_plan(
        emb, "label = 0", None, 4, corpus_count=60, selectivity=None,
        id_col="vec_id",
    )
    assert first.is_cached
    second, _np2 = similarity._prefilter_plan(
        emb, "label = 1", None, 4, corpus_count=60, selectivity=None,
        id_col="vec_id",
    )
    assert second.is_cached
    assert not first.is_cached  # evicted by the second call
    assert len(similarity._FLT_ID_CACHE) == 1
