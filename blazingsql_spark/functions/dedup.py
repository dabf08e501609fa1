"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
- exact dedup = hash-groupBy on a 128-bit content hash (one shuffle on the
  hash key — never on the raw text);
- MinHash LSH = shingle→signature→band→bucket-join: the only shuffle keys
  are tiny band hashes, candidate verification happens per-bucket;
- SimHash = 64-bit signature via per-bit weighted sums, near-dup = Hamming
  ball via banded self-join;
- n-gram Jaccard = exact verifier for LSH candidates (never run all-pairs).

Hashes are md5-based (seeded by prefix concat) rather than Spark's murmur3 —
md5 is engine-portable, so every step is differential-testable against an
external SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------------ exact
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the smallest id per identical content hash.

    One shuffle, on md5(text) — 32 bytes per row regardless of document size,
    so the shuffle volume is O(rows), not O(corpus bytes).
    """
    fp = F.md5(F.col(text_col)).alias("fp")
    return (
        df.select(fp, F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


# --------------------------------------------------------------- shingles
def word_shingles(text: Column, n: int = 2) -> Column:
    """Array of word n-gram shingles (distinct). Pure JVM expressions."""
    ws = F.split(F.trim(text), r"\s+")
    if n == 1:
        return F.array_distinct(ws)
    # zip_with over shifted slices is linear; transform+element_at is
    # quadratic (element_at re-walks the array inside the lambda).
    m = F.size(ws) - (n - 1)
    out = F.slice(ws, 1, F.greatest(m, F.lit(0)))
    for k in range(1, n):
        out = F.zip_with(
            out,
            F.slice(ws, k + 1, F.greatest(m, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.array_distinct(out)


# ---------------------------------------------------------------- MinHash
def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 2,
) -> DataFrame:
    """MinHash signature per document: hash h_i(doc) = min over shingles of
    md5(i || shingle). md5-string min is a valid permutation-min and is
    byte-identical in any engine (differential-testable).

    Scale shape: ONE shuffle — all num_hashes mins are parallel aggregates
    over the exploded shingles (partial aggregation map-side), so shuffle
    rows are (id, k×32-byte hashes) regardless of document size. No per-seed
    row blowup, no collect_list.
    """
    shingled = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle")
    )
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{seed}|"), F.col("shingle")))).alias(f"mh{seed}")
        for seed in range(1, num_hashes + 1)
    ]
    return (
        shingled.groupBy(id_col)
        .agg(*mins)
        .select(
            id_col,
            F.array(*[F.col(f"mh{s}") for s in range(1, num_hashes + 1)]).alias("signature"),
        )
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band the signature (rows = num_hashes /
    bands), bucket-join on (band_idx, band_hash), emit distinct (a < b) pairs.

    The self-join shuffles only band hashes; at 100 TB the bucket key space
    keeps skew bounded (collision probability per band ~ similarity^rows).
    """
    assert num_hashes % bands == 0
    banded = _banded_signatures(df, text_col, id_col, num_hashes, bands, shingle_n)
    # the self-join would recompute the whole shingle->signature lineage
    # twice; persist the (tiny) banded signature table instead. At scale
    # you'd write it out once and join against it many times
    # (build_signature_index below does exactly that).
    banded = banded.persist()
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def cross_corpus_candidates(
    reference: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """Cross-corpus MinHash-LSH candidates: corpus documents that share a
    band bucket with ANY reference document — distinct (ref_id, corpus_id)
    pairs. This is the banded-join scale path for decontamination /
    cross-corpus near-dup detection: ``detect_contamination`` broadcasts
    the eval set's n-grams (exact containment, eval-side must be small),
    while this shape handles a LARGE reference side too — both corpora
    reduce to (id, band, band_hash) rows (32-byte hashes, O(rows×bands)
    shuffle regardless of document size) and candidates come from one
    equi-join on (band, band_hash); no all-pairs, no broadcast
    requirement (AQE broadcasts the smaller banded side when it fits).
    The same md5-seeded signatures as lsh_candidate_pairs, so identical
    text always collides in every band and the whole pipeline stays
    engine-portable (oracle-checkable)."""
    ref_b = _banded_signatures(
        reference, text_col, id_col, num_hashes, bands, shingle_n
    ).select(F.col(id_col).alias("ref_id"), "band", "band_hash")
    cor_b = _banded_signatures(
        corpus, text_col, id_col, num_hashes, bands, shingle_n
    ).select(F.col(id_col).alias("corpus_id"), "band", "band_hash")
    return (
        ref_b.join(cor_b, ["band", "band_hash"])
        .select("ref_id", "corpus_id")
        .distinct()
    )


def exact_dedup_keep_best(
    df: DataFrame,
    score_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup keeping the BEST-scoring row per identical content
    (ties broken by smallest id) instead of exact_dedup's min-id rule —
    the practical production policy when duplicates differ in metadata
    quality (e.g. keep the copy with the richest extraction score).
    Returns (fp, keep_id, n_dups, best_score).

    Same scale shape as exact_dedup: ONE shuffle on md5(text) carrying
    (32-byte hash, id, score) per row; the winner is a max_by partial
    aggregate — no per-group sort, no window."""
    fp = F.md5(F.col(text_col)).alias("fp")
    # Tie-break via min_by over (negated score, NATIVE id): negating the id
    # instead (the r7 spelling) required a numeric cast that broke string
    # doc_ids at analysis time and silently mis-ranked int64 ids past
    # double's 2^53 integer cliff (ADVICE r7). Struct comparison is
    # lexicographic, so this is max-score-then-min-id for any orderable id
    # type, with the id compared in its own type. The ordering key guards
    # the two degenerate score classes so keep_id stays consistent with
    # best_score = max(__s): NULL scores order LAST (a bare -NULL would
    # sort FIRST in the struct and let an unscored row win), and NaN maps
    # to -inf so a NaN row wins exactly when max() reports NaN as best.
    ns = F.when(F.isnan(F.col("__s")), F.lit(float("-inf"))).otherwise(
        -F.col("__s")
    )
    return (
        df.select(fp, F.col(id_col), F.col(score_col).cast("double").alias("__s"))
        .groupBy("fp")
        .agg(
            F.min_by(
                F.col(id_col),
                F.struct(
                    F.coalesce(ns, F.lit(float("inf"))).alias("ns"),
                    F.col(id_col).alias("i"),
                ),
            ).alias("keep_id"),
            F.count("*").alias("n_dups"),
            F.max("__s").alias("best_score"),
        )
    )


# ------------------------------------------------------------ n-gram Jaccard
def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    threshold: float = 0.0,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all (a < b) pairs that share at
    least one shingle. Intersection via shingle-key join (never a cross
    join); union = |A| + |B| - |A∩B|.

    At scale this is the *verifier* for LSH candidates — join `df` down to
    candidate ids first; the shingle join then touches only candidates.

    ``max_shingle_df`` caps shingle document frequency: a single hot shingle
    (a stopword bigram appearing in d documents) fans the self-join out to
    d² pairs — quadratic in the corpus. Shingles with df > cap are dropped
    from the UNIVERSE (both intersections and sizes), i.e. Jaccard over the
    stopword-filtered shingle sets — the standard trade for 100 TB safety.
    Hot shingles carry ~no similarity signal anyway. None = exact.
    """
    shingled = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle")
    )
    if max_shingle_df is not None:
        # the HOT set is tiny by construction (few shingles exceed the cap)
        # → broadcast anti-join; shingles are unique per doc so COUNT(*)=df
        hot = (
            shingled.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("shingle")
        )
        shingled = shingled.join(F.broadcast(hot), "shingle", "left_anti")
    shingled = shingled.persist()  # used three times below (sizes + both join sides)
    sizes = shingled.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a, b = shingled.alias("a"), shingled.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            # FLOOR grid, not ROUND: int/int ratios can land exactly on a
            # rounding tie, where Java (shortest-repr) and C (binary value)
            # disagree; floor of an IEEE-identical double never does.
            (
                F.floor(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")) * 1000000)
                / 1000000
            ).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


# ----------------------------------------------------------------- SimHash
def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash signature: per-bit weighted vote over token hashes.

    Token hash = first 15 hex chars of md5 → 60 usable bits; signature bit b
    is 1 iff the sum over tokens of (±1 by token-bit b) is positive. Pure
    JVM expressions (conv/shiftright/bit ops); one groupBy per document.
    """
    assert bits <= 60
    tokens = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).select(
        id_col,
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    per_doc = tokens.groupBy(id_col).agg(*votes)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return per_doc.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded so the self-join
    key is a signature chunk (pigeonhole: distance ≤ max_hamming with
    bands > max_hamming guarantees one identical band)."""
    assert bands > max_hamming, (
        f"pigeonhole needs bands > max_hamming (got bands={bands}, "
        f"max_hamming={max_hamming}): {max_hamming} differing bits can hit "
        f"{max_hamming} distinct bands, leaving none identical"
    )
    sig = simhash(df, text_col, id_col, bits)
    width = bits // bands
    chunks = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).select(
        id_col,
        "simhash",
        "band",
        # SQL-form shiftright: the Python wrapper only takes a literal count
        F.expr(f"shiftright(simhash, band * {width}) & {(1 << width) - 1}").alias("chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cands.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# ------------------------------------------------------ bloom membership
def _bloom_positions(fp: Column, n_bits: int, n_hashes: int) -> Column:
    """Array of ``n_hashes`` bit positions for a 32-hex content fingerprint.

    Positions are md5-derived (seed-prefixed, first 15 hex digits → bigint
    → pmod n_bits) — the same engine-portable hash idiom as
    minhash_signature and sampling.hash_bucket, so an external SQL oracle
    reproduces every bit exactly."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"bf{i}|"), fp)), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(n_bits),
            )
            for i in range(n_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    text_col: str = "text",
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter over a corpus's CONTENT fingerprints as a tiny
    (word_idx BIGINT, word BIGINT) table: n_bits packed 32-per-word via a
    bit_or aggregate. The membership screen for incremental ingestion at
    100 TB: a new batch asks "which documents are DEFINITELY new?" against
    the whole history by joining ~n_bits/32 rows (broadcastable at any
    corpus size — size the filter by history cardinality, ~10 bits/item
    for ~1% false positives), instead of anti-joining petabytes of
    history. Definitely-new docs skip the exact-dedup path entirely;
    maybe-present docs (bounded false-positive rate) fall through to the
    exact md5 anti-join on a tiny fraction of the batch.

    Only 32 of each word's 64 bits are used so the `1 << (p % 32)` bit
    value stays positive and bit-identical in any engine (bit 63 would
    need engine-specific overflow/sign handling). The filter is
    DETERMINISTIC — same corpus, same bits, on any engine and any
    partitioning — so it is differential-testable, unlike library blooms
    with private hash mixes."""
    fp = F.md5(F.col(text_col))
    return (
        df.select(F.explode(_bloom_positions(fp, n_bits, n_hashes)).alias("p"))
        .select(
            F.floor(F.col("p") / 32).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(p % 32 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Probe a bloom_build filter: returns (id, maybe_dup) — maybe_dup is
    TRUE iff ALL n_hashes bits for the document's content fingerprint are
    set (present-or-false-positive; FALSE is a guarantee of novelty).

    Shape: explode the batch to n_hashes (id, position) rows, equi-join
    the ≤ n_bits/32-row word table (AQE broadcasts it), one groupBy on id.
    The history corpus is never touched."""
    fp = F.md5(F.col(text_col))
    probes = df.select(
        F.col(id_col),
        F.explode(_bloom_positions(fp, n_bits, n_hashes)).alias("p"),
    ).select(
        F.col(id_col),
        F.floor(F.col("p") / 32).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, CAST(p % 32 AS INT))").alias("bit"),
    )
    # min(hit) == 1 ⇔ EVERY probed bit was set. sum(hit) == n_hashes (the
    # first spelling) breaks on duplicated ids (2·n_hashes hits read as a
    # miss — a false NEGATIVE from the screen whose contract forbids them)
    # and on NULL fingerprints (NULL hits vanish from the sum). The
    # coalesce pins NULL-position probes to a definite miss, so a NULL
    # text yields maybe_dup = false — "treat as novel", which the exact
    # downstream verify then adjudicates.
    hit = F.coalesce(
        (
            F.col("word").isNotNull()
            & (F.col("word").bitwiseAND(F.col("bit")) != 0)
        ).cast("int"),
        F.lit(0),
    )
    return (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy(id_col)
        .agg((F.min(hit) == F.lit(1)).alias("maybe_dup"))
    )


# ------------------------------------------------------- incremental dedup
def build_signature_index(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, bands: int = 4, shingle_n: int = 2,
) -> None:
    """Persist the banded MinHash index for a corpus: (id, band, band_hash)
    parquet. New document batches dedup against this index with one
    equi-join — the corpus itself is never rescanned (the incremental-ingest
    path for a growing 100 TB corpus)."""
    banded = _banded_signatures(df, text_col, id_col, num_hashes, bands, shingle_n)
    banded.write.mode("overwrite").parquet(path)


def _banded_signatures(df, text_col, id_col, num_hashes, bands, shingle_n):
    rows = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, num_hashes, shingle_n)
    return sig.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "signature",
    ).select(
        id_col,
        "band",
        F.md5(F.concat_ws("|", F.slice(F.col("signature"), F.col("band") * rows + 1, rows))).alias(
            "band_hash"
        ),
    )


def incremental_near_dup_check(
    spark,
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
    exclude_epoch: int | None = None,
) -> DataFrame:
    """Check a batch of new documents against the persisted index: returns
    (new_id, matched_corpus_id) candidate near-dup pairs. Works identically
    inside foreachBatch for a streaming ingest pipeline.

    Epoch-partitioned indexes (written by ``streaming.ingest.DedupIngest``
    through ``sources.manifest``) are read manifest-gated — superseded
    epochs and half-written compaction output are invisible — and
    ``exclude_epoch`` drops the named epoch from the reference so a
    replayed foreachBatch epoch never matches its own earlier attempt.
    Legacy flat (un-partitioned) indexes read as before — the guard lives
    in sources.manifest.read_live, shared with the lexical index."""
    from blazingsql_spark.sources import manifest as mf

    index = mf.read_live(
        spark, index_path, mf.read_manifest(spark, index_path), exclude_epoch
    )
    new_banded = _banded_signatures(new_docs, text_col, id_col, num_hashes, bands, shingle_n)
    return (
        new_banded.alias("n")
        .join(
            index.alias("i"),
            (F.col("n.band") == F.col("i.band")) & (F.col("n.band_hash") == F.col("i.band_hash")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"i.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )


def build_signature_index_table(
    df: DataFrame,
    spark,
    table: str,
    num_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """Bucketed variant of build_signature_index: persist the banded index
    as a managed table bucketed+sorted on (band, band_hash) — the exact
    join key, so the bucketed scan's partitioning satisfies the join. The payoff is
    partitioning REUSE: every later incremental check joins on band_hash,
    and a bucketed scan satisfies the join's distribution requirement
    directly — the index (the corpus-sized side, the one that grows
    forever) is NEVER shuffled again; only the new batch moves. Appends
    via append_to_signature_index_table keep the bucket spec."""
    banded = _banded_signatures(df, text_col, id_col, num_hashes, bands, shingle_n)
    (
        banded.write.mode("overwrite")
        .bucketBy(num_buckets, "band", "band_hash")
        .sortBy("band", "band_hash")
        .format("parquet")
        .saveAsTable(table)
    )
    return spark.table(table)


def append_to_signature_index_table(
    df: DataFrame,
    spark,
    table: str,
    num_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
) -> None:
    """Append a new batch's signatures, preserving the bucket layout (Spark
    validates the spec matches the existing table)."""
    banded = _banded_signatures(df, text_col, id_col, num_hashes, bands, shingle_n)
    (
        banded.write.mode("append")
        .bucketBy(num_buckets, "band", "band_hash")
        .sortBy("band", "band_hash")
        .format("parquet")
        .saveAsTable(table)
    )


def incremental_near_dup_check_table(
    spark,
    new_docs: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """incremental_near_dup_check against the bucketed index table: same
    candidates, but the index scan carries its bucket distribution into the
    join — no exchange on the ever-growing side (plan-asserted in
    tests/test_scale.py)."""
    index = spark.table(table)
    new_banded = _banded_signatures(new_docs, text_col, id_col, num_hashes, bands, shingle_n)
    return (
        new_banded.alias("n")
        .join(
            index.alias("i"),
            (F.col("n.band") == F.col("i.band")) & (F.col("n.band_hash") == F.col("i.band_hash")),
        )
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"i.{id_col}").alias("corpus_id"),
        )
        .distinct()
    )


def detect_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """Benchmark-decontamination check: which eval documents leak into the
    training corpus? Returns (eval_id, train_id, match_kind) where
    match_kind is 'exact' (identical normalized text) or 'near' (MinHash
    band collision — same candidate generation as the dedup path, so
    near-verbatim paraphrases surface too).

    Scale shape: the eval set is the small side (thousands of rows vs a
    100 TB corpus) — both probes are equi-joins (md5 / band_hash) where the
    corpus is scanned once and only the tiny eval side broadcasts; never an
    all-pairs comparison. Run it BEFORE training, on the same banded
    signatures the dedup index already maintains."""
    t_fp = train.select(
        F.col(id_col).alias("train_id"), F.md5(F.col(text_col)).alias("fp")
    )
    e_fp = eval_set.select(
        F.col(id_col).alias("eval_id"), F.md5(F.col(text_col)).alias("fp")
    )
    exact = e_fp.join(t_fp, "fp").select(
        "eval_id", "train_id", F.lit("exact").alias("match_kind")
    )

    t_sig = _banded_signatures(train, text_col, id_col, num_hashes, bands, shingle_n)
    e_sig = _banded_signatures(eval_set, text_col, id_col, num_hashes, bands, shingle_n)
    near = (
        e_sig.alias("e")
        .join(
            t_sig.alias("t"),
            (F.col("e.band") == F.col("t.band"))
            & (F.col("e.band_hash") == F.col("t.band_hash")),
        )
        .select(
            F.col(f"e.{id_col}").alias("eval_id"),
            F.col(f"t.{id_col}").alias("train_id"),
        )
        .distinct()
        .join(exact.select("eval_id", "train_id"), ["eval_id", "train_id"], "left_anti")
        .select("eval_id", "train_id", F.lit("near").alias("match_kind"))
    )
    return exact.unionAll(near)


def _doc_grams(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared tokenize + n-gram construction for the span operators:
    returns (toks(_id, pos, token), grams(_id, pos, gram)) where pos is
    the gram's START token position (0-based, contiguous over the
    non-empty tokens). One place to change the tokenization regex /
    hot-key strategy for both the exposure metric and the rewrite.

    r12: grams come straight off the token ARRAY via
    transform(sequence(...)) — n-gram adjacency is a per-row array
    property, so the per-doc lead-window (a full Exchange + Sort of the
    token stream) was pure overhead (guide §2.4 "remove shuffles
    outright"). Same gram strings, and pos is now contiguous over the
    FILTERED tokens on both frames (the old raw-split positions agreed
    with these everywhere the tokenizer saw single spaces; the oracle's
    positions are the filtered ones)."""
    base = _tokens_base(docs, id_col, text_col)
    toks = base.select("_id", F.posexplode("__ws").alias("pos", "token"))
    grams = base.filter(F.size("__ws") >= int(n)).select(
        "_id", F.posexplode(_gram_array(n)).alias("pos", "gram")
    )
    return toks, grams


def _tokens_base(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, __ws): lowercase whitespace token ARRAY per document."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda x: x != F.lit(""),
        ).alias("__ws"),
    )


def _gram_array(n: int, arr_col: str = "__ws") -> Column:
    """array of space-joined n-grams over ``arr_col`` (requires
    size >= n; index i in the result = the gram's 0-based start pos)."""
    return F.transform(
        F.sequence(F.lit(0), F.size(arr_col) - int(n)),
        lambda i: F.concat(
            *[
                part
                for j in range(n)
                for part in ([F.lit(" ")] if j else [])
                + [F.element_at(F.col(arr_col), i + F.lit(j + 1))]
            ]
        ),
    )


def duplicated_ngram_spans(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gram_df: int | None = None,
) -> DataFrame:
    """Per-document duplicated-substring exposure: what fraction of a
    document's token n-grams also occur in at least one OTHER document.
    The span-level view of dedup (cf. Lee et al., "Deduplicating Training
    Data Makes Language Models Better" — their suffix-array ExactSubstr
    dedup removes 50-token repeated spans; this is the distributed n-gram
    formulation of the same signal): a doc can be globally unique yet be
    mostly stitched from boilerplate spans, which doc-level MinHash never
    sees.

    Returns (id, n_grams, n_dup, dup_frac) for every doc with >= n tokens.

    Scale shape — ONE tokenize pass (a dup-table self-join would recompute
    the explode+lead subtree on both branches; at 100 TB tokenization IS
    the dominant cost, so the plan instead flows straight down):
    tokenize+explode map-side → per-doc lead-window builds grams → early
    collapse to (gram, doc, k) grain (map-side partial combine, so shuffle
    bytes are distinct pairs, not positions) → document frequency as a
    count over the gram-partitioned window → per-doc aggregate. At 100 TB:
    additionally hash grams to 64-bit with xxhash64 before the (gram, doc)
    shuffle (8-byte keys instead of strings) and set ``max_gram_df`` — the
    same hot-key cap as ``jaccard_pairs`` — so ubiquitous boilerplate
    grams ("all rights reserved") don't count as duplication signal; here
    grams stay raw strings so the operator is bit-differential-testable
    against a SQL oracle."""
    from pyspark.sql import Window

    _toks, grams = _doc_grams(docs, n, id_col, text_col)
    per_doc_gram = grams.groupBy("gram", "_id").agg(F.count(F.lit(1)).alias("k"))
    flagged = per_doc_gram.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("gram"))
    )
    dup_cond = F.col("df") > 1
    if max_gram_df is not None:
        dup_cond = dup_cond & (F.col("df") <= max_gram_df)
    return (
        flagged.groupBy("_id")
        .agg(
            F.sum("k").alias("n_grams"),
            F.sum(F.when(dup_cond, F.col("k")).otherwise(F.lit(0))).alias("n_dup"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "n_dup",
            (F.floor(F.col("n_dup") * F.lit(1000000.0) / F.col("n_grams")) / 1000000).alias(
                "dup_frac"
            ),
        )
    )


def remove_duplicated_ngram_spans(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 2,
) -> DataFrame:
    """The REWRITE form of span dedup (Lee et al. 2022 ExactSubstr removes
    the repeated spans themselves, keeping the rest of the document —
    ``duplicated_ngram_spans`` only measures exposure): every token
    covered by an n-gram that occurs in >= ``min_doc_freq`` distinct
    documents is dropped, and the survivors are reassembled in order.

    Returns (id, n_tokens, n_removed, text_clean) for every doc with >= 1
    token; a fully-boilerplate doc comes back with text_clean = ''
    (downstream length filters then drop it — rewriting and dropping stay
    separate decisions).

    Scale shape (r12 restructure, guide §2.3/§2.4 — tokens now cross a
    shuffle exactly once, as grams): the gram stream is exploded off the
    per-doc token array and hash-REPARTITIONED ON THE GRAM KEY once; the
    duplicated-gram table (groupBy gram) and the coverage join both
    consume that single exchange (ReusedExchange — previously each
    branch re-derived the token stream through its own shuffle). Covered
    positions collapse to ONE small array per document, and the rewrite
    itself is per-row array algebra against the doc-level token array —
    the old token-level (doc, pos) explode/distinct/join/groupBy chain
    (4 exchanges over token-grain rows + a collect_list sort) is gone.
    Plan: 1 gram exchange + 1 doc-key exchange of (doc, covered-array)
    rows + the doc-level join back; nothing broadcasts that scales with
    the corpus, nothing is quadratic."""
    base = _tokens_base(docs, id_col, text_col).filter(F.size("__ws") >= 1)
    gexp = base.filter(F.size("__ws") >= int(n)).select(
        "_id", F.posexplode(_gram_array(n)).alias("pos", "gram")
    )
    if int(min_doc_freq) == 2:
        # Default tier (r12): df >= 2 ⟺ the gram's doc-id min and max
        # differ, so the duplicated-gram decision is two O(1)-state window
        # aggregates over the gram partition — ONE exchange of the gram
        # stream, no dup-table join, and no second derivation of the
        # scan→tokenize→explode chain (the join spelling intended a
        # ReusedExchange, but column pruning makes the dup branch's
        # subtree non-identical, so the whole chain ran twice — measured
        # as two ~530 ms single-task stages per execution at sf0.1).
        # Never a collect_set: per-gram AGGREGATION state stays constant
        # whatever the gram's document frequency. (Partition-level hot-gram
        # skew is unchanged vs the join spelling: Window.partitionBy still
        # routes every occurrence of a hot gram through one task,
        # WindowExec materializing/spilling the partition — ADVICE r12.)
        from pyspark.sql import Window

        w = Window.partitionBy("gram")
        covered = (
            gexp.withColumn("__dmin", F.min("_id").over(w))
            .withColumn("__dmax", F.max("_id").over(w))
            .filter(F.col("__dmin") != F.col("__dmax"))
            .select("_id", "pos")
        )
    else:
        gexp = gexp.repartition("gram")
        dup = (
            gexp.groupBy("gram")
            .agg(F.count_distinct("_id").alias("df"))
            .filter(F.col("df") >= int(min_doc_freq))
            .select("gram")
        )
        covered = gexp.join(dup, "gram").select("_id", "pos")
    cov = (
        covered.groupBy("_id")
        .agg(
            F.array_sort(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(
                            F.sequence(F.col("pos"), F.col("pos") + F.lit(int(n) - 1))
                        )
                    )
                )
            ).alias("__cov")
        )
    )
    keep = F.array_except(
        F.sequence(F.lit(0), F.size("__ws") - 1),
        F.coalesce(F.col("__cov"), F.array().cast("array<int>")),
    )
    return (
        base.join(cov, "_id", "left")
        # keep-materializing projection: __keep is referenced twice below;
        # a single select would inline the array_except per use
        .select("_id", "__ws", keep.alias("__keep"))
        .select(
            F.col("_id").alias(id_col),
            F.size("__ws").cast("long").alias("n_tokens"),
            (F.size("__ws") - F.size("__keep")).cast("long").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.col("__keep"), lambda i: F.element_at(F.col("__ws"), i + F.lit(1))
                ),
                " ",
            ).alias("text_clean"),
        )
    )


def bitstring_candidate_pairs(
    df: DataFrame,
    sig_col: str,
    id_col: str,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs over a fixed-length '0'/'1' bit-string signature
    column (perceptual dHash / audio envelope / any simhash-family
    fingerprint): split the signature into ``bands`` equal slices, bucket
    self-join on identical slices (the pigeonhole stage — two signatures
    within ``max_hamming <= bands - 1`` bits MUST agree on at least one
    whole band, so candidate generation is provably lossless for that
    radius), then verify exact hamming on the candidates only. Never
    all-pairs: the shuffles are band-hash equi-joins, the same scale
    shape as the SimHash text path.

    Returns (id_a, id_b, hamming) with id_a < id_b and
    hamming <= max_hamming."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming <= bands-1 "
            f"(got {max_hamming} vs {bands} bands)"
        )
    # NULL signatures (decode failures under on_error='skip') carry no
    # bits to compare: exclude them up front rather than letting them
    # surface as a baffling mixed-width error that aborts the whole job
    df = df.filter(F.col(sig_col).isNotNull())
    # one fixed width, divisible by bands: mixed widths would band-collide
    # across lengths and zip_with's null padding silently UNDERCOUNTS the
    # hamming of the uncompared tail (bounded probe: <=2 rows collected)
    widths = [
        r[0]
        for r in df.select(F.length(F.col(sig_col))).distinct().limit(2).collect()
    ]
    if not widths:
        # empty (or all-NULL) input: no pairs, by definition — not an error
        from pyspark.sql import types as T

        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("id_a", df.schema[id_col].dataType),
                    T.StructField("id_b", df.schema[id_col].dataType),
                    T.StructField("hamming", T.LongType()),
                ]
            ),
        )
    if len(widths) != 1:
        raise ValueError(
            f"bitstring_candidate_pairs: signatures must share one fixed "
            f"width (found lengths {sorted(widths)}...)"
        )
    if widths[0] % int(bands):
        raise ValueError(
            f"bitstring_candidate_pairs: width {widths[0]} not divisible by "
            f"{bands} bands — the tail would be uncovered by every band"
        )
    width = F.length(F.col(sig_col))
    banded = df.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(int(bands) - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.substring(
                        F.col(sig_col),
                        (b * (width / int(bands)).cast("int")) + 1,
                        (width / int(bands)).cast("int"),
                    ).alias("band_hash"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "_sig", F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._sig").alias("__sa"),
            F.col("r._sig").alias("__sb"),
        )
        .distinct()
    )
    ham = F.size(
        F.filter(
            F.zip_with(
                F.split(F.col("__sa"), ""),
                F.split(F.col("__sb"), ""),
                lambda a, b: a != b,
            ),
            lambda x: x,
        )
    )
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= int(max_hamming))
        .select("id_a", "id_b", "hamming")
    )
