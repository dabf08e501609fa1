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
