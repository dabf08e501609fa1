"""Document packing: assign documents to fixed-token-budget training
sequences ("packs") — the standard LLM-pretraining data layout step
(concatenate docs in a stable order, cut every `budget` tokens).

Semantics (deterministic, engine-portable): documents are laid out
contiguously in ``order_by`` order; a document's pack is the pack its FIRST
token lands in (``pack_id = start_offset DIV budget``), its offset within
that pack is ``start_offset % budget``, and ``spills`` flags documents that
cross a pack boundary (a downstream tokenizer either truncates these or
continues into the next pack — both policies need exactly this layout).

Scale shape: the cumulative token offset is a GLOBAL prefix sum — computed
with operators.window.global_running (range-partitioned chunked two-pass
aggregation), so no single-partition window ever sees the corpus. All
arithmetic is integer, so results are bit-identical across engines and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from blazingsql_spark.functions import text as text_fns
from blazingsql_spark.operators.window import global_running


def pack_documents(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_counter=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (id, n_tokens, pack_id, pack_offset, spills) per document.

    ``token_counter``: Column-function text → token count; defaults to the
    whitespace counter (functions.text.token_count). Swap in
    ``bpe_ish_token_count`` or a real tokenizer-length column upstream.
    ``order_by`` is the id column — it must be unique (it defines the
    deterministic concatenation order).
    """
    counter = token_counter or text_fns.token_count
    tokens: Column = counter(F.col(text_col))
    base = df.select(F.col(id_col), tokens.cast("long").alias("n_tokens"))
    cum = global_running(
        base,
        order_by=[id_col],
        sum_cols={"cum_tokens": "n_tokens"},
        num_partitions=num_partitions,
    )
    start = F.col("cum_tokens") - F.col("n_tokens")
    return cum.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.expr(f"(cum_tokens - n_tokens) DIV {int(budget)}").alias("pack_id"),
        (start % F.lit(int(budget))).alias("pack_offset"),
        ((start % F.lit(int(budget))) + F.col("n_tokens") > F.lit(int(budget))).alias(
            "spills"
        ),
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The complement of pack_documents: SPLIT long documents into
    overlapping token windows of at most ``max_tokens`` (stride
    ``max_tokens - overlap``) — the context-window chunking step for
    training or retrieval indexing.

    Per-row arithmetic + one posexplode: chunk i of a doc covers tokens
    [i*stride, i*stride + max_tokens); a doc emits
    ceil((n_tokens - max_tokens)/stride) + 1 chunks (min 1, so empty docs
    survive as one empty chunk and row counts stay auditable). No shuffle,
    no state — scan-side, like every per-document op here. Deterministic
    integer math + whitespace tokens, so DuckDB computes the identical
    chunking (list slicing is 1-based inclusive on both sides).
    """
    assert 0 <= overlap < max_tokens
    stride = max_tokens - overlap
    t = F.trim(F.col(text_col))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    n = F.size(toks)
    n_chunks = F.when(
        n > max_tokens,
        F.floor((n - max_tokens + stride - 1) / stride).cast("int") + 1,
    ).otherwise(F.lit(1))
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            # posexplode's 0-based position IS the chunk id
            F.posexplode(F.sequence(F.lit(1), n_chunks)).alias("chunk_id", "__i"),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, max_tokens),
                " ",
            ).alias("chunk_text"),
        )
        .withColumn(
            "n_chunk_tokens",
            F.when(F.length("chunk_text") == 0, F.lit(0)).otherwise(
                F.size(F.split(F.col("chunk_text"), " "))
            ),
        )
    )
