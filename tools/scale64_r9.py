"""64x scale measurement for the round-8 additions (VERDICT r8 item 7).

Replicates sf0.1 documents/embeddings 64x with disjoint ids (same
replication discipline as every prior SCALING.md experiment) and times
the r8-added shuffle-bound operators at 1x and 64x, best-of-2, noop
sink. Run: python tools/scale64_r9.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blazingsql_spark.functions import similarity
from blazingsql_spark.functions.dedup import remove_duplicated_ngram_spans
from blazingsql_spark.functions.text import (
    kn_bigram_negative_logprob,
    kn_trigram_negative_logprob,
)
from blazingsql_spark.queries.registry import load_table
from blazingsql_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
REPS = 64
OFF = 10_000_000


def replicate(df, id_col, reps):
    r = df.sparkSession.range(reps).select(F.col("id").alias("__r"))
    return (
        df.crossJoin(r)
        .withColumn(id_col, F.col(id_col) + F.col("__r") * OFF)
        .drop("__r")
    )


def bench(name, build):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.2f} s", flush=True)
    return best


def main():
    spark = get_spark(master="local[32]")
    docs1 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb1 = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    docs64 = replicate(docs1, "doc_id", REPS).localCheckpoint(eager=True)
    emb64 = replicate(emb1, "vec_id", REPS).localCheckpoint(eager=True)
    print("docs:", docs1.count(), "->", docs64.count())
    print("emb:", emb1.count(), "->", emb64.count())

    def margin_ann(emb):
        a = emb.filter(F.col("vec_id") % 20 == 0)
        b = emb.filter(F.col("vec_id") % 20 != 0)

        def lsh_knn(corpus, queries, kk):
            return similarity.ann_lsh_topk(
                corpus, queries, k=kk, dim=64, bands=4, bits_per_band=16
            )

        return similarity.margin_mine(a, b, k=4, threshold=1.0, knn=lsh_knn)

    def semdedup(emb):
        # bounded default path (cap 2000), 8 clusters — the production shape
        return similarity.semantic_dedup_keep(
            emb, n_clusters=8, threshold=0.95, dim=64
        )

    cases = {
        "dedup_spans_rewrite": lambda d, e: remove_duplicated_ngram_spans(d, n=3),
        "perplexity_kn2": lambda d, e: kn_bigram_negative_logprob(d),
        "perplexity_kn3": lambda d, e: kn_trigram_negative_logprob(d),
        "margin_mine_ann": lambda d, e: margin_ann(e),
        "semdedup_bounded": lambda d, e: semdedup(e),
    }
    for name, fn in cases.items():
        t1 = bench(f"{name} 1x", lambda: fn(docs1, emb1))
        t64 = bench(f"{name} 64x", lambda: fn(docs64, emb64))
        print(f"== {name}: {t1:.2f} -> {t64:.2f}  ratio {t64 / t1:.1f}x", flush=True)


if __name__ == "__main__":
    main()
