"""Property-based tests (hypothesis) — beyond the reference's methodology
(SURVEY §5: "No property-based/randomized testing"): Spark operators vs
plain-Python/pandas models on randomized inputs."""

from __future__ import annotations

import pytest

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from blazingsql_spark.functions import dedup
from blazingsql_spark.operators import asof_join

# Hypothesis long-tail: nightly tier (r13 — the default gate must fit the
# driver's verify budget; see pyproject addopts)
pytestmark = pytest.mark.slow


words = st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=0, max_size=12)


@settings(max_examples=15, deadline=None)
@given(words)
def test_word_shingles_matches_python_model(spark, tokens):
    text = " ".join(tokens)
    got = spark.createDataFrame([(text,)], ["t"]).select(
        dedup.word_shingles(F.col("t"), 2).alias("s")
    ).first()["s"]
    toks = text.split()
    want = list(dict.fromkeys(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(-100, 100)),
        min_size=1,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000), st.integers(-100, 100)),
        min_size=1,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    lpdf = pd.DataFrame(lrows, columns=["k", "t", "lv"]).sort_values("t")
    rpdf = pd.DataFrame(rrows, columns=["k", "t", "rv"]).sort_values("t")
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf.rename(columns={"t": "rt"})).select(
        F.col("k"), F.col("rt").alias("t"), F.col("rv")
    )
    # all three direction modes against pandas' reference semantics
    # (unique (k, t) right rows, so tie-rules don't differ between models;
    # pandas 'nearest' also resolves exact ties backward)
    for direction in ("backward", "forward", "nearest"):
        got = (
            asof_join(
                ldf, rdf, on="t", by=["k"], right_value_cols=["rv"],
                direction=direction,
            )
            .orderBy("k", "t")
            .toPandas()
        )
        want = pd.merge_asof(
            lpdf, rpdf, on="t", by="k", direction=direction
        ).sort_values(["k", "t"]).reset_index(drop=True)
        got = got[["k", "t", "lv", "rv"]].reset_index(drop=True)
        want = want[["k", "t", "lv", "rv"]]
        pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=direction)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 5), st.integers(-100, 100)),
        min_size=2,
        max_size=20,
    )
)
def test_asof_join_duplicate_timestamps_deterministic(spark, rrows):
    """Right sides with duplicate (by, on) rows must resolve identically on
    repeated runs (content-hash tiebreak), and the winner must carry a
    timestamp consistent with its values (single-struct carry)."""
    ldf = spark.createDataFrame([(k, t, 0) for k in (0, 1) for t in range(6)], ["k", "t", "lv"])
    rdf = spark.createDataFrame(pd.DataFrame(rrows, columns=["k", "t", "rv"]))
    runs = [
        tuple(
            sorted(
                (r.k, r.t, r.rv)
                for r in asof_join(
                    ldf.repartition(seed + 2), rdf.repartition(seed + 3),
                    on="t", by=["k"], right_value_cols=["rv"],
                ).collect()
            )
        )
        for seed in range(3)
    ]
    assert runs[0] == runs[1] == runs[2]
    # the pinned winner is the max-xxhash right row among ties; for integer
    # rv the chosen value must at least be one of the tied candidates
    cand = {}
    for k, t, rv in rrows:
        cand.setdefault((k, t), set()).add(rv)
    for k, t, rv in runs[0]:
        if rv is not None:
            tied = set().union(
                *[vs for (ck, ct), vs in cand.items() if ck == k and ct <= t]
            )
            assert rv in tied


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 2), st.floats(0, 50)), min_size=1, max_size=15),
    st.lists(st.tuples(st.integers(0, 2), st.floats(0, 50)), min_size=1, max_size=15),
)
def test_range_join_matches_naive_model(spark, lrows, rrows):
    from blazingsql_spark.operators import range_join

    ldf = spark.createDataFrame(
        [(k, float(v), i) for i, (k, v) in enumerate(lrows)], ["k", "lv", "lid"]
    )
    rdf = spark.createDataFrame(
        [(k, float(v), i) for i, (k, v) in enumerate(rrows)], ["k", "rv", "rid"]
    )
    got = {
        (r.lid, r.rid)
        for r in range_join(ldf, rdf, "lv", "rv", 5.0, by=["k"]).collect()
    }
    want = {
        (li, ri)
        for li, (lk, lv) in enumerate(lrows)
        for ri, (rk, rv) in enumerate(rrows)
        if lk == rk and abs(lv - rv) <= 5.0
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 120)), min_size=1, max_size=12
    ),
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(0, 120)), min_size=1, max_size=12
    ),
    st.sampled_from([1, 7, 50, 1000]),
    st.sampled_from([0, 1 << 60]),  # base offset: also exercise the >2^53 regime
)
def test_interval_join_matches_naive_model(spark, lrows, rrows, width, base):
    """interval_join == brute-force half-open overlap for ANY intervals,
    bucket width, and base offset — including endpoints beyond double's
    2^53 integer cliff (the integral fast path regime)."""
    from blazingsql_spark.operators.asof import interval_join

    ldf = spark.createDataFrame(
        [(i, base + s, base + s + d + 1) for i, (s, d) in enumerate(lrows)],
        ["lid", "ls", "le"],
    )
    rdf = spark.createDataFrame(
        [(i, base + s, base + s + d + 1) for i, (s, d) in enumerate(rrows)],
        ["rid", "rs", "re"],
    )
    got = {
        (r.lid, r.rid)
        for r in interval_join(ldf, rdf, "ls", "le", "rs", "re", bucket_width=width).collect()
    }
    want = {
        (li, ri)
        for li, (ls, ld) in enumerate(lrows)
        for ri, (rs, rd) in enumerate(rrows)
        if (base + ls) < (base + rs + rd + 1) and (base + rs) < (base + ls + ld + 1)
    }
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(min_size=0, max_size=40),  # includes unicode + empties
        ),
        min_size=1,
        max_size=20,
        unique=True,
    ),
    st.sampled_from(["", "split", "mix", "überSalt"]),
)
def test_hash_bucket_portable_to_duckdb(spark, keys, salt):
    """Every sampling/split/shard decision rides hash_bucket — Spark's
    conv(substring(md5(...)) and DuckDB's ('0x' || substr(md5(...)))::BIGINT
    must agree for ANY key (unicode, empty, negative ints) and salt, or
    assignments silently diverge between engine and oracle."""
    import duckdb

    from blazingsql_spark.functions.sampling import hash_bucket

    df = spark.createDataFrame([(str(k),) for k in keys], ["k"])
    got = {
        r["k"]: r["b"]
        for r in df.select("k", hash_bucket(F.col("k"), 10_000, salt).alias("b")).collect()
    }
    con = duckdb.connect()
    for k in keys:
        want = con.execute(
            "SELECT ('0x' || substr(md5(? || ?), 1, 15))::BIGINT % 10000", [salt, str(k)]
        ).fetchone()[0]
        assert got[str(k)] == want, (k, salt, got[str(k)], want)
