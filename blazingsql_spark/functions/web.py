"""Web-corpus hygiene: domain blocklist filtering with subdomain
semantics — the standard first gate of a crawl pipeline (block
"tracker.com" and every host under it).

The scale shape matters here: the naive spelling is `host LIKE '%.' ||
domain` against the blocklist — a cross join with a per-pair string scan,
quadratic in (hosts × blocklist). Instead each host explodes into its
≤ label-count dot-suffixes ("a.b.c.com" → [a.b.c.com, b.c.com, c.com,
com]) and ONE equi-join on the suffix does all the matching — the same
explode-then-equijoin discipline as the shingle/banding dedup operators.
Blocklist size is irrelevant to the plan: lists beyond broadcast range
simply shuffle on the suffix key like any join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_suffixes(host: Column) -> Column:
    """Array of a hostname's dot-suffixes, longest first. NULL host → NULL
    (drops out of the downstream explode → never blocked)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + F.lit(1)), "."),
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    domain_col: str = "domain",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop (or with ``keep_blocked`` select) every row whose host equals
    a blocklist domain OR sits anywhere under one. Matching is one
    equi-join on exploded host suffixes; the join back onto ``df`` is a
    semi/anti join on the (distinct, bounded-by-#hosts) hit list."""
    hits = (
        df.select(
            F.col(host_col),
            F.explode(host_suffixes(F.col(host_col))).alias("__sfx"),
        )
        .join(blocklist.select(F.col(domain_col).alias("__sfx")), "__sfx")
        .select(host_col)
        .distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    return df.join(hits, host_col, how)
