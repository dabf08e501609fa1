"""Streaming-maintainer micro-batch audit (r13, VERDICT r12 item 6).

Each streaming maintainer is a foreachBatch handler — its per-epoch work
is ordinary batch DataFrames — so this harness drives every maintainer
directly with fixture batches (epoch 0 = cold build, epochs 1..2 = steady
state), and records per epoch:

  - wall seconds,
  - the number of Spark JOBS the epoch launched (setJobGroup +
    statusTracker.getJobIdsForGroup — at micro-batch sizes the sequential
    job count, not bytes, dominates latency on this host),

and dumps the steady-state per-batch PLAN of each maintainer's compute
body (the same library function the handler calls) to
plans/r13/stream_<name>_plan.txt, with an Exchange count summary — the
guide §2 exchange-count discipline applied to the streaming paths.

Usage: python tools/r13_stream_audit.py [--epochs N]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return "".join(
        ch if ch.isprintable() or ch in "\n\t" else f"\\x{ord(ch):02x}" for ch in p
    )


def _exchanges(df) -> int:
    return _plan(df).count("Exchange")


def main() -> int:
    epochs = 3
    for a in sys.argv[1:]:
        if a.startswith("--epochs"):
            epochs = int(a.split("=", 1)[1])

    from pyspark.sql import functions as F

    from blazingsql_spark.queries.registry import load_table
    from blazingsql_spark.session import get_spark

    spark = get_spark(app_name="r13_stream_audit", master="local[4]")
    sc = spark.sparkContext
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    embs = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    doc_batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(epochs)]
    emb_batches = [embs.filter(F.col("vec_id") % 3 == i) for i in range(epochs)]
    # synthetic CDC batches over a small keyed table
    cdc_batches = [
        spark.range(200).select(
            F.col("id").alias("k"),
            (F.col("id") * 10 + i).alias("v"),
            F.when(F.col("id") % 17 == i, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.lit(i).cast("long").alias("version"),
        )
        for i in range(epochs)
    ]
    edge_batches = [
        spark.range(300).select(
            (F.col("id") + i * 7).alias("src"), (F.col("id") % 50 + i).alias("dst")
        )
        for i in range(epochs)
    ]
    val_batches = [
        spark.range(5000).select(((F.col("id") % 997) * (i + 1) / 7.0).alias("v"))
        for i in range(epochs)
    ]

    tmp = tempfile.mkdtemp(prefix="r13_stream_audit_")
    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    results = {}

    def run(name, handler, batches):
        rows = []
        for e, b in enumerate(batches):
            group = f"{name}-e{e}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            handler(b, e)
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            rows.append((e, round(wall, 3), jobs))
        results[name] = rows
        print(name, rows, flush=True)

    from blazingsql_spark.streaming.ingest import (
        AnnIndexIngest,
        BloomCorpusIngest,
        CdcApplyIngest,
        ComponentsIngest,
        CorpusPrepIngest,
        DedupIngest,
        LexicalIndexIngest,
        PcaIngest,
        QuantileSketchIngest,
    )

    run("dedup", DedupIngest(spark, f"{tmp}/d_idx", f"{tmp}/d_corp"), doc_batches)
    run(
        "corpus_prep",
        CorpusPrepIngest(spark, f"{tmp}/cp_idx", f"{tmp}/cp_corp"),
        doc_batches,
    )
    run("lexical", LexicalIndexIngest(spark, f"{tmp}/lex"), doc_batches)
    run(
        "bloom",
        BloomCorpusIngest(spark, f"{tmp}/b_scr", f"{tmp}/b_corp"),
        doc_batches,
    )
    run(
        "ann",
        AnnIndexIngest(spark, f"{tmp}/ann", iterations=2, hnsw_m=4, hnsw_ef=16),
        emb_batches,
    )
    run("pca", PcaIngest(spark, f"{tmp}/pca", k=4), emb_batches)
    run("components", ComponentsIngest(spark, f"{tmp}/cc"), edge_batches)
    run(
        "cdc",
        CdcApplyIngest(spark, f"{tmp}/cdc", key_cols=["k"]),
        cdc_batches,
    )
    run("quantile", QuantileSketchIngest(spark, f"{tmp}/qs", "v"), val_batches)

    # ---- steady-state per-batch compute plans (the handlers' bodies) ----
    from blazingsql_spark.functions import dedup as D
    from blazingsql_spark.functions import sketches
    from blazingsql_spark.functions.text import _tokens
    from blazingsql_spark.operators.graph import incremental_components
    from blazingsql_spark.operators.merge import cdc_apply
    from blazingsql_spark.sources import manifest as mf

    b = doc_batches[-1]
    plans = {
        "dedup_check": D.incremental_near_dup_check(
            spark, b, f"{tmp}/d_idx", exclude_epoch=epochs - 1
        ),
        "dedup_signatures": D._banded_signatures(b, "text", "doc_id", 8, 4, 2),
        "lexical_postings": _tokens(b, "doc_id", "text")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf")),
        "bloom_probe": D.bloom_probe(
            b,
            mf.read_live(
                spark, f"{tmp}/b_scr/words", mf.read_manifest(spark, f"{tmp}/b_scr")
            )
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word")),
            "text",
            "doc_id",
            1 << 16,
            4,
        ),
        "components_step": incremental_components(
            spark.read.parquet(f"{tmp}/cc/snap={epochs - 1}"), edge_batches[-1]
        ),
        "cdc_apply": cdc_apply(
            spark.read.parquet(f"{tmp}/cdc/snap={epochs - 1}"),
            cdc_batches[-1],
            ["k"],
            "op",
            "version",
        ),
        "quantile_build": sketches.ddsketch_build(val_batches[-1], "v"),
    }
    for pname, df in plans.items():
        txt = _plan(df)
        path = os.path.join(outdir, f"stream_{pname}_plan.txt")
        with open(path, "w") as f:
            f.write(txt.rstrip() + "\n")
        print(f"{pname}: exchanges={txt.count('Exchange')} -> {path}", flush=True)

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
