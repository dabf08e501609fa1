"""Scale-machinery tests: salting preserves semantics, bucketing removes
the shuffle, AQE confs are live."""

from __future__ import annotations

from blazingsql_spark.operators.skew import bucketed_table, salted_join
from blazingsql_spark.plans import exchange_count, join_strategies
from blazingsql_spark.queries.registry import load_table
from tests.conftest import SF_DIR, normalize


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    supp = load_table(spark, SF_DIR, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    plain = li.join(supp, "l_suppkey").select("l_orderkey", "l_suppkey", "s_name", "l_quantity")
    salted = salted_join(li, supp, on="l_suppkey", salt=4).select(
        "l_orderkey", "l_suppkey", "s_name", "l_quantity"
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        normalize(salted.toPandas()), normalize(plain.toPandas()), check_dtype=False
    )


def test_salted_left_join_keeps_unmatched(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    supp = (
        load_table(spark, SF_DIR, "supplier")
        .filter("s_suppkey <= 3")
        .withColumnRenamed("s_suppkey", "l_suppkey")
    )
    plain = li.join(supp, "l_suppkey", "left")
    salted = salted_join(li, supp, on="l_suppkey", how="left", salt=4)
    assert salted.count() == plain.count()
    assert (
        salted.filter("s_name IS NULL").count() == plain.filter("s_name IS NULL").count()
    )


def test_bucketed_join_has_no_shuffle(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        bo = bucketed_table(orders, spark, "b_orders", "o_orderkey", 8)
        bl = bucketed_table(lineitem, spark, "b_lineitem", "o_orderkey", 8)
        joined = bo.join(bl, "o_orderkey")
        assert exchange_count(joined) == 0, joined._jdf.queryExecution().toString()
        assert join_strategies(joined).get("SortMergeJoin", 0) == 1
        # and the result is still right
        assert joined.count() == load_table(spark, SF_DIR, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_merge_upsert(spark):
    from blazingsql_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "v"]
    )
    source = spark.createDataFrame([(2, "B", 99.0), (4, "d", 40.0)], ["id", "name", "v"])
    out = {r.id: (r.name, r.v) for r in merge_upsert(target, source, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2_apply(spark):
    from pyspark.sql import functions as F

    from blazingsql_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "alice", "2020-01-01", "2021-01-01"),  # history
            (1, "alicia", "2021-01-01", None),  # current, will change
            (2, "bob", "2020-01-01", None),  # current, untouched
        ],
        ["id", "name", "valid_from", "valid_to"],
    )
    updates = spark.createDataFrame([(1, "alyssa")], ["id", "name"])
    out = scd2_apply(dim, updates, ["id"], F.lit("2022-06-15"))
    rows = {(r.id, r.name): (r.valid_from, r.valid_to) for r in out.collect()}
    assert rows[(1, "alice")] == ("2020-01-01", "2021-01-01")  # history untouched
    assert rows[(1, "alicia")] == ("2021-01-01", "2022-06-15")  # closed
    assert rows[(1, "alyssa")] == ("2022-06-15", None)  # new current
    assert rows[(2, "bob")] == ("2020-01-01", None)  # untouched current
    # exactly one current row per key
    cur = out.filter("valid_to IS NULL").groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_rollup_matches_direct_aggregation(spark, tmp_path):
    from pyspark.sql import functions as F

    from blazingsql_spark.operators import rollup as R

    ev = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "events_rollup")
    R.materialize_rollup(ev, path, bucket="5 minutes")
    rolled = R.read_rollup(spark, path)

    # rollup grain matches direct bucketed aggregation
    direct = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n")
    )
    assert rolled.count() == direct.count()

    # re-aggregation from the rollup == direct totals from raw data
    got = {
        r.event_type: (r.n, round(r.sum_v, 2))
        for r in R.reaggregate(rolled).collect()
    }
    want = {
        r.event_type: (r.n, round(r.sum_v, 2))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_v"))
        .collect()
    }
    assert got == want

    # time-range query prunes on the date partition column
    from blazingsql_spark.plans import physical_plan

    pruned = rolled.filter("bucket_date = DATE '2024-01-01'")
    assert "PartitionFilters" in physical_plan(pruned)


def test_rollup_late_data_refresh(spark, tmp_path):
    """Late events must refresh ONLY the day partitions they touch, and the
    refreshed rollup must equal a from-scratch rebuild over all raw data."""
    import glob

    from pyspark.sql import functions as F

    from blazingsql_spark.operators import rollup as R

    ev = load_table(spark, SF_DIR, "events")
    events_path = str(tmp_path / "raw")
    rollup_path = str(tmp_path / "rollup")
    dates = sorted(
        r["d"] for r in ev.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    assert len(dates) >= 2, "fixture needs >= 2 event dates"
    d_late, d_other = dates[0], dates[-1]

    # initial load: everything except some day-1 stragglers
    late = ev.filter(
        (F.to_date("ts") == F.lit(d_late)) & (F.col("event_id") % 5 == 0)
    )
    ontime = ev.join(late.select("event_id"), "event_id", "left_anti")
    ontime.write.parquet(events_path)
    R.materialize_rollup(spark.read.parquet(events_path), rollup_path)

    untouched_before = sorted(glob.glob(f"{rollup_path}/bucket_date={d_other}/*.parquet"))
    refreshed = R.refresh_rollup(spark, late, events_path, rollup_path)
    assert refreshed == [d_late]

    # only the late date's partition was rewritten
    untouched_after = sorted(glob.glob(f"{rollup_path}/bucket_date={d_other}/*.parquet"))
    assert untouched_before == untouched_after

    # refreshed rollup == from-scratch rollup over ALL events
    got = {
        (r.bucket_start, r.event_type): (r.n, round(r.sum_v, 6))
        for r in R.read_rollup(spark, rollup_path).collect()
    }
    want = {
        (r.bucket_start, r.event_type): (r.n, round(r.sum_v, 6))
        for r in R.build_rollup(ev).collect()
    }
    assert got == want


def test_rollup_refresh_stream(spark, tmp_path):
    """Streaming continuous-aggregate maintenance: micro-batches (with late
    rows) keep the rollup equal to a batch rebuild."""
    from pyspark.sql import functions as F

    from blazingsql_spark.operators import rollup as R

    ev = load_table(spark, SF_DIR, "events").limit(2000)
    stream_in = str(tmp_path / "in")
    ev.repartition(4).write.parquet(stream_in)  # 4 files → 4 micro-batches
    stream = (
        spark.readStream.schema(spark.read.parquet(stream_in).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_in)
    )
    q = R.rollup_refresh_stream(
        spark,
        stream,
        str(tmp_path / "raw"),
        str(tmp_path / "rollup"),
        str(tmp_path / "ckpt"),
    )
    # availableNow self-terminates once all 4 files are processed; assert
    # that it DID (a timeout under host load previously surfaced as a
    # confusing half-rollup data mismatch instead of "didn't finish")
    assert q.awaitTermination(600), "stream did not finish within 600s"

    got = {
        (r.bucket_start, r.event_type): (r.n, round(r.sum_v, 6))
        for r in R.read_rollup(spark, str(tmp_path / "rollup")).collect()
    }
    want = {
        (r.bucket_start, r.event_type): (r.n, round(r.sum_v, 6))
        for r in R.build_rollup(spark.read.parquet(stream_in)).collect()
    }
    assert got == want


def test_bucketed_dedup_index_never_reshuffles(spark, tmp_path):
    """Partitioning reuse across stages: the bucketed signature index joins
    incremental batches with NO exchange on the index side (the side that
    is corpus-sized and grows forever), and yields the same candidates as
    the plain parquet index."""
    from pyspark.sql import functions as F

    from blazingsql_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(50)

    plain_path = str(tmp_path / "idx")
    D.build_signature_index(corpus, plain_path)
    want = sorted(
        map(tuple, D.incremental_near_dup_check(spark, batch, plain_path).collect())
    )

    import uuid

    table = f"sig_idx_{uuid.uuid4().hex[:8]}"
    D.build_signature_index_table(corpus, spark, table, num_buckets=8)
    got = sorted(
        map(tuple, D.incremental_near_dup_check_table(spark, batch, table).collect())
    )
    assert got == want

    # force a non-broadcast plan and assert the index side carries its
    # bucketing into the join: exactly ONE exchange (the new batch), and
    # the bucketed scan reports its buckets
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cand = D.incremental_near_dup_check_table(spark, batch, table)
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount" in plan, plan
        joins = plan.count("SortMergeJoin")
        assert joins == 1, plan
        # the join's exchanges: batch side shuffles, index side must not
        pre_join = plan.split("SortMergeJoin")[1]
        assert pre_join.count("Exchange hashpartitioning") <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # appends preserve the layout and become visible to the next check
    D.append_to_signature_index_table(batch, spark, table, num_buckets=8)
    again = D.incremental_near_dup_check_table(spark, batch, table)
    # every batch doc now matches itself in the index
    self_matches = again.filter(F.col("new_id") == F.col("corpus_id")).count()
    assert self_matches == batch.count()
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_salted_agg_equals_plain_agg(spark):
    """salted_agg must be bit-equal to the plain GROUP BY on a genuinely
    skewed key (l_returnflag: 3 values over all of lineitem), for any salt."""
    from pyspark.sql import functions as F

    from blazingsql_spark.operators.skew import salted_agg
    from blazingsql_spark.queries.registry import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").withColumn(
        "q_cents", F.floor(F.col("l_quantity") * 100).cast("long")
    )
    plain = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("q_cents").alias("s"))
        .collect()
    }
    for salt in (2, 16, 64):
        got = {
            r["l_returnflag"]: (r["n"], r["s"])
            for r in salted_agg(
                li, ["l_returnflag"], sum_cols={"s": "q_cents"}, count_as="n", salt=salt
            ).collect()
        }
        assert got == plain, (salt, got, plain)


def test_cdc_apply_semantics(spark):
    from blazingsql_spark.operators.merge import cdc_apply

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "val"]
    )
    log = spark.createDataFrame(
        [
            (1, "a2", "U", 1),  # update
            (1, "a3", "U", 3),  # later update wins over v1
            (2, None, "D", 2),  # delete
            (2, "b2", "U", 1),  # older than the delete -> irrelevant
            (4, "d", "I", 1),   # insert new key
            (3, "c2", "U", 5),  # same-version U+D pair: delete wins
            (3, None, "D", 5),
        ],
        ["id", "val", "op", "version"],
    )
    got = {r.id: r.val for r in cdc_apply(snap, log, ["id"]).collect()}
    assert got == {1: "a3", 4: "d"}, got
    # empty log is a no-op
    empty = log.limit(0)
    same = {r.id: r.val for r in cdc_apply(snap, empty, ["id"]).collect()}
    assert same == {1: "a", 2: "b", 3: "c"}

    # ADVICE r6: two same-version non-delete rows for one key (a replayed/
    # duplicated log) must survive DETERMINISTICALLY — the payload-hash
    # tie-break picks the same row on every run and partitioning
    dup = spark.createDataFrame(
        [(1, "x1", "U", 7), (1, "x2", "U", 7), (1, "x3", "U", 7)],
        ["id", "val", "op", "version"],
    )
    winners = {
        cdc_apply(snap, dup.repartition(n), ["id"]).filter("id = 1").first().val
        for n in (1, 3, 7)
    }
    assert len(winners) == 1, winners  # same survivor at any partitioning

    # ADVICE r7: xxhash64 SKIPS null arguments, so two same-version
    # payloads differing only in WHICH column is null used to hash
    # identically ((NULL,'a') vs ('a',NULL)) and the survivor was again
    # engine-ordering-dependent. With the null-sentinel encoding the two
    # rows hash apart and the same one wins at any partitioning.
    snap2 = spark.createDataFrame([(9, "a", "b")], ["id", "v1", "v2"])
    nulldup = spark.createDataFrame(
        [(9, None, "a", "U", 7), (9, "a", None, "U", 7)],
        ["id", "v1", "v2", "op", "version"],
    )
    null_winners = {
        tuple(
            cdc_apply(snap2, nulldup.repartition(n), ["id"])
            .filter("id = 9")
            .select("v1", "v2")
            .first()
        )
        for n in (1, 2, 3)
    }
    assert len(null_winners) == 1, null_winners


def test_zorder_layout_tightens_per_file_bounding_boxes(spark, tmp_path):
    """The point of z-ordering: after repartitionByRange+sort on the
    Morton key, each parquet file's (min,max) box over BOTH participating
    columns is tight, so multi-predicate scans prune. Assert it
    structurally from the real file footers: the summed bounding-box AREA
    of the z-ordered layout must be a small fraction of the natural
    layout's (which has near-full-range boxes on at least one column).
    Results themselves must be identical on both layouts."""
    import glob

    import pyarrow.parquet as pq

    from blazingsql_spark.queries.registry import load_table
    from blazingsql_spark.sources.layout import zorder_write

    li = load_table(spark, SF_DIR.replace("0.001", "0.01"), "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    nat, zod = str(tmp_path / "nat"), str(tmp_path / "zod")
    li.repartition(16).write.parquet(nat)
    zorder_write(li, ["l_partkey", "l_suppkey"], zod, n_files=16, bits=16)

    def box_area(path):
        total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                cols = {
                    row.column(c).path_in_schema: row.column(c).statistics
                    for c in range(row.num_columns)
                }
                pk, sk = cols["l_partkey"], cols["l_suppkey"]
                total += (pk.max - pk.min + 1) * (sk.max - sk.min + 1)
        return total

    a_nat, a_zod = box_area(nat), box_area(zod)
    assert a_zod < a_nat / 4, (a_nat, a_zod)

    pred = "l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 10 AND 40"
    r_nat = spark.read.parquet(nat).filter(pred).count()
    r_zod = spark.read.parquet(zod).filter(pred).count()
    assert r_nat == r_zod and r_nat > 0
