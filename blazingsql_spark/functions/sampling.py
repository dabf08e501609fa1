"""Deterministic sampling, splitting, and sharding for training-data
pipelines.

Everything here is keyed on a *portable* content hash — the first 15 hex
chars of md5 (60 bits) decoded to a BIGINT — so each decision is (a)
per-row with no global coordination (scales to any corpus size without a
sort or a shuffle for the assignment itself), (b) stable across runs,
engines, partitionings, and data growth (a document keeps its split when
the corpus doubles), and (c) differential-testable against DuckDB, which
computes the identical bucket from the identical SQL.

Reference parity: BlazingSQL exposes no sampling surface (its SAMPLE
clause is unimplemented — algebra rejects it); these are the training-data
superset ops the task calls for, in the same spirit as functions.dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Bucket grid for split assignment. 60-bit md5 prefix mod 10_000 gives a
#: worst-case quantization error of 1e-4 on requested fractions.
SPLIT_BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int, salt: str = "") -> Column:
    """Portable deterministic bucket in [0, buckets) from any column.

    ``conv(substring(md5(salt || col), 1, 15), 16, 10) % buckets`` — the
    DuckDB spelling ``('0x' || substr(md5(...), 1, 15))::BIGINT % buckets``
    produces the identical value (15 hex chars = 60 bits, fits a BIGINT).
    The salt decouples independent decisions (split vs shard) made from the
    same key: without it, split and shard assignments would be correlated.
    """
    keyed = F.concat(F.lit(salt), col.cast("string"))
    h = F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test...) by hash bucket.

    Per-row, shuffle-free, and stable: a row's split depends only on its id
    and the salt, never on what else is in the corpus — append more data
    and existing assignments don't move (the property that keeps eval sets
    uncontaminated across dataset versions). Weights are quantized to
    1/SPLIT_BUCKETS.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = hash_bucket(F.col(id_col), SPLIT_BUCKETS, salt)
    expr: Column | None = None
    edge = 0.0
    names = list(weights)
    for name in names[:-1]:
        edge += weights[name] / total * SPLIT_BUCKETS
        cond = bucket < int(round(edge))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def stratified_cap(
    df: DataFrame,
    group_cols: list[str],
    cap: int,
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically.

    The within-group order is the hash of the id — an unbiased, stable
    "random" sample without an RNG, so reruns and engines agree. One
    shuffle on the group key; per-group state is a single counter. This is
    the domain-balancing primitive (cap documents per domain/lang so a
    crawl's head domains don't dominate the training mix).
    """
    order = [hash_bucket(F.col(id_col), 1 << 30, salt).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def assign_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 1024,
    salt: str = "shard",
    out_col: str = "shard",
) -> DataFrame:
    """Assign a stable shard id in [0, n_shards) — the write-side layout
    for training export. Hash sharding doubles as a global shuffle: any
    upstream ordering (crawl order, URL locality) is destroyed, so a
    sequential reader of shard files sees an i.i.d.-ish mix without a
    separate ORDER BY RAND() pass over the corpus."""
    return df.withColumn(out_col, hash_bucket(F.col(id_col), n_shards, salt))


def shard_write(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 1024,
    salt: str = "shard",
) -> None:
    """Export as hash-sharded parquet: one directory per shard, one file
    per shard (repartition on the shard id co-locates each shard before
    the partitioned write, so the layout is n_shards files, not
    n_shards × n_tasks). Readers get deterministic, resumable,
    well-shuffled input splits."""
    sharded = assign_shard(df, id_col, n_shards, salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def domain_mix_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Downsample each domain so the surviving corpus matches a target mix
    (the training-mix control knob: "40% web, 20% code, ..." over a crawl
    whose natural mix is different).

    The largest corpus reachable by downsampling alone has total
    T = min_d(count_d / weight_d) — the binding domain keeps 100% — and
    every domain keeps rate_d = T·w_d / c_d of its rows, decided per-row by
    the portable hash (quantized to 1e-6). Plan shape: one tiny groupBy
    (per-domain counts, partial-aggregated to |domains| rows) broadcast
    back onto the corpus; the corpus itself NEVER shuffles — the keep/drop
    decision is a map-only filter, so this scales to any corpus size.
    Domains absent from ``weights`` (or with weight 0) are dropped.
    """
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__c"))
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    rated = (
        counts.withColumn("__w", wmap[F.col(domain_col)])
        .filter(F.col("__w").isNotNull() & (F.col("__w") > 0))
        .withColumn("__t", F.col("__c") / F.col("__w"))
    )
    total = rated.agg(F.min("__t").alias("__T"))
    # alias both sides: total derives from rated, and an unqualified column
    # in the self-joined lineage is ambiguous to the analyzer
    thresholds = rated.alias("r").crossJoin(F.broadcast(total.alias("t"))).select(
        F.col(f"r.{domain_col}").alias(domain_col),
        # integer threshold on the 1e-6 grid; expression shape mirrors the
        # DuckDB oracle exactly so the IEEE result is bit-identical
        F.floor(F.lit(1_000_000) * F.col("t.__T") * F.col("r.__w") / F.col("r.__c"))
        .cast("long")
        .alias("__thresh"),
    )
    bucket = hash_bucket(F.col(id_col), 1_000_000, salt)
    return (
        df.join(F.broadcast(thresholds), domain_col)
        .filter(bucket < F.col("__thresh"))
        .drop("__thresh")
    )


def weighted_sample(
    df: DataFrame,
    prob: Column,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic Bernoulli sampling with PER-ROW probability: keep a
    row iff its salted hash bucket (of 1e6) falls under prob·1e6. No RNG,
    no state, no shuffle — reruns, engines, and partitionings agree, and
    appending data never flips existing decisions. The quality-weighted
    downsampling primitive (e.g. keep long/high-quality docs with higher
    probability) with probabilities quantized to 1e-6."""
    bucket = hash_bucket(F.col(id_col), 1_000_000, salt)
    return df.filter(bucket < (prob * 1_000_000).cast("long"))


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "shuffle",
    order_col: str = "shuffle_order",
) -> DataFrame:
    """Reproducible global corpus shuffle for training-data ordering:
    sort by the salted 60-bit md5 hash of the id (ties broken by id —
    md5 collisions on 60 bits are real at corpus scale). A distributed
    range-partitioned sort, identical across runs/engines/partitionings;
    changing ``seed`` yields an independent permutation (fresh data
    order per training epoch without materializing anything).

    At 100 TB: one range exchange — exactly the cost of any global sort,
    and shards written from this order are internally shuffled too."""
    key = hash_bucket(F.col(id_col), 1 << 60, salt=seed)
    return df.withColumn(order_col, key).orderBy(order_col, id_col)


def token_budget_head(
    df: DataFrame,
    budget: int,
    token_col: str,
    id_col: str = "doc_id",
    seed: str = "budget",
) -> DataFrame:
    """Select documents up to a TOKEN budget (not a row budget) in
    deterministic-shuffle order — 'give me ~1B tokens of this corpus,
    reproducibly': running token total over the hash order, keep rows
    while the PREVIOUS total is under budget (so the document that
    crosses the line is included and the selection is never empty).

    The running sum uses operators.window.global_running — chunked
    two-pass prefix aggregation, NO single-partition window, so the
    cut scales like a sort rather than a bottleneck."""
    from blazingsql_spark.operators.window import global_running

    ordered = deterministic_shuffle(df, id_col=id_col, seed=seed)
    run = global_running(
        ordered,
        order_by=["shuffle_order", id_col],
        sum_cols={"cum_tokens": token_col},
    )
    return run.filter(
        (F.col("cum_tokens") - F.col(token_col)) < F.lit(budget)
    ).drop("shuffle_order")


def _hashed_grams(df: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(id, bucket, c): hashed unigram+bigram counts per document — the
    DSIR feature map. One explode, one partial-agg groupBy; bucket ids
    come from the portable md5 hash so DuckDB reproduces them exactly."""
    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    uni = F.filter(ws, lambda x: x != F.lit(""))
    bi = F.when(
        F.size(uni) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(uni) - 1),
            lambda i: F.concat_ws(" ", F.element_at(uni, i), F.element_at(uni, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = df.select(
        F.col(id_col), F.explode(F.concat(uni, bi)).alias("gram")
    )
    return (
        grams.select(id_col, hash_bucket(F.col("gram"), n_buckets, "dsir:").alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("c"))
    )


def _bucket_dist(feats: DataFrame, count_col: str) -> tuple[DataFrame, DataFrame]:
    """((bucket, count), 1-row total) from a per-doc feature table — the
    aggregate is bounded by n_buckets rows; the total is one row, so both
    broadcast by construction."""
    counts = feats.groupBy("bucket").agg(F.sum("c").alias(count_col))
    total = counts.agg(F.sum(count_col).alias(f"{count_col}_total"))
    return counts, total


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw document by how target-like its hashed n-gram
    distribution is, then resample the raw corpus by weight (compose with
    ``weighted_sample`` / ``sample_weighted_es`` for the draw itself).

    Features are hashed unigram+bigram counts in ``n_buckets`` dimensions
    (the published estimator's bag-of-hashed-ngrams); the weight is the
    log likelihood ratio  sum_b c_b * [ln p_hat(b) - ln q_hat(b)]  with
    add-``alpha`` smoothed bucket distributions p_hat (target) and q_hat
    (raw). Documents with no tokens score 0.

    Plan shape at 100 TB: the raw corpus is scanned twice (once for its
    bucket distribution, once for per-doc features) — both map-side
    partial aggregates; the target corpus (typically a small quality
    sample) once. Everything joined is bounded by ``n_buckets`` rows, so
    the log-ratio table broadcasts by construction — per-doc scoring is
    a map-side broadcast join + one partial-agg groupBy on the doc id.
    No unbounded shuffle beyond the two feature groupBys."""
    raw_feats = _hashed_grams(raw, id_col, text_col, n_buckets)
    tgt_feats = _hashed_grams(target, id_col, text_col, n_buckets)
    q_counts, q_total = _bucket_dist(raw_feats, "qc")
    p_counts, p_total = _bucket_dist(tgt_feats, "pc")
    # every scored gram exists in the raw corpus by construction, so raw
    # buckets form the domain; missing target buckets smooth to alpha
    ab = F.lit(float(alpha))
    ratio = (
        q_counts.join(p_counts, "bucket", "left")
        .crossJoin(F.broadcast(q_total))
        .crossJoin(F.broadcast(p_total))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("pc"), F.lit(0)).cast("double") + ab)
                    / (F.coalesce(F.col("pc_total"), F.lit(0)).cast("double") + ab * n_buckets)
                )
                - F.log(
                    (F.col("qc").cast("double") + ab)
                    / (F.col("qc_total").cast("double") + ab * n_buckets)
                )
            ).alias("log_ratio"),
        )
    )
    scored = (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("log_ratio")).alias("dsir_logw"))
    )
    return raw.select(id_col).join(scored, id_col, "left").select(
        id_col, F.coalesce(F.col("dsir_logw"), F.lit(0.0)).alias("dsir_logw")
    )


def temperature_weights(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-LM sampling
    rule, cf. XLM-R / mT5): w_d = p_d^alpha / sum_e p_e^alpha with
    p_d the corpus share of domain d. alpha < 1 upsamples the tail so
    low-resource domains are not drowned; alpha = 1 recovers natural
    sampling. One groupBy to the |domains| grain, then two tiny
    aggregates over that dictionary — the corpus is scanned once."""
    a = float(alpha)
    per = df.filter(F.col(domain_col).isNotNull()).groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = per.agg(F.sum("n").cast("double").alias("__N"))
    powed = per.crossJoin(F.broadcast(tot)).withColumn(
        "__pa", F.pow(F.col("n") / F.col("__N"), F.lit(a))
    )
    z = powed.agg(F.sum("__pa").alias("__Z"))
    return powed.crossJoin(F.broadcast(z)).select(
        F.col(domain_col),
        "n",
        (F.col("__pa") / F.col("__Z")).alias("weight"),
    )


def contrastive_negatives(
    vectors: DataFrame,
    anchors: DataFrame,
    k: int = 4,
    pool_size: int = 256,
    sim_cap: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_id_col: str = "anchor_id",
    salt: str = "negpool",
) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive training
    (the shared-pool recipe every two-tower/CLIP-style pipeline uses):
    a SINGLE hash-ordered pool of ``pool_size`` corpus rows serves every
    anchor — the pool broadcasts, so the pairing is anchors x
    broadcast(pool), never corpus x corpus — with ACCIDENTAL POSITIVES
    masked out (the pool member IS the anchor, or its rounded cosine
    reaches ``sim_cap`` — unmasked near-duplicates are false negatives
    that actively poison a contrastive loss). Each anchor's k negatives
    are the smallest ``md5(salt:anchor:candidate)`` ranks — per-anchor
    decorrelated, fully replayable (the DuckDB twin reproduces every
    pair), and stable across runs/partitionings.

    Cosine is ROUND(,6)-compared against ``sim_cap`` (the repo's
    cross-engine float grid); pool selection is a global top-P by
    ``md5(salt:id)`` — a TakeOrdered, not a full sort, at scale.

    NULL-id rows are excluded on BOTH sides (ids key the ranks, and the
    cross-engine NULL-concat semantics differ); a ragged or all-zero
    embedding yields a NULL cosine and the pair drops — mirrored by the
    oracle's length/zero guards. Dot products and norms come from
    functions.similarity (double-accumulated, ANSI-safe zero guard),
    with the per-row norms HOISTED before the cross join so the O(dim)
    aggregates run once per row, not once per pair.

    Returns (anchor_id, neg_id, rank), rank 1..k."""
    from blazingsql_spark.functions import similarity

    pool = (
        vectors.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("__pid"), F.col(vec_col).alias("__pvec"))
        .orderBy(F.md5(F.concat_ws(":", F.lit(salt), F.col("__pid").cast("string"))))
        .limit(int(pool_size))
        .withColumn("__pnorm", similarity.l2_norm(F.col("__pvec")))
    )
    a = anchors.filter(F.col(anchor_id_col).isNotNull()).select(
        F.col(anchor_id_col), F.col(vec_col).alias("__avec")
    ).withColumn("__anorm", similarity.l2_norm(F.col("__avec")))
    denom = F.col("__anorm") * F.col("__pnorm")
    pairs = (
        a.crossJoin(F.broadcast(pool))
        .filter(F.col(anchor_id_col) != F.col("__pid"))
        .withColumn(
            "__cos",
            F.round(
                F.when(
                    denom != 0.0,
                    similarity.dot(F.col("__avec"), F.col("__pvec")) / denom,
                ),
                6,
            ),
        )
        .filter(F.col("__cos") < F.lit(float(sim_cap)))
    )
    w = Window.partitionBy(anchor_id_col).orderBy(
        F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.col(anchor_id_col).cast("string"),
                F.col("__pid").cast("string"),
            )
        )
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col(anchor_id_col),
            F.col("__pid").alias("neg_id"),
            "rank",
        )
    )
