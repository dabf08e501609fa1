"""Fuzzy (approximate-string) join — deletion-neighborhood blocking.

The data-cleaning join: match records whose keys differ by a typo. An
all-pairs levenshtein filter is O(n·m) and dies at scale; the scalable
formulation is SymSpell-style blocking: two strings within edit distance
1 ALWAYS share a member of their single-deletion neighborhoods
({s} ∪ {s with one char deleted} — substitution: deleting the differing
char from each side meets in the middle; insertion/deletion: the longer
side's neighborhood contains the shorter string). So candidate
generation is an EQUI-join on neighborhood variants (explode factor
len+1 per row), and exact levenshtein runs only on candidates — the same
generate-cheap/verify-exact discipline as the LSH dedup path.

The neighborhood explode is a pure JVM expression (transform over a
sequence of deletion positions), no UDFs. Distances > 1 need
multi-deletion neighborhoods (C(len, d) growth) — out of scope here,
as in SymSpell's default tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletion_variants(col: Column) -> Column:
    """Array of the string itself plus every single-character deletion."""
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1),          # prefix before position i
            col.substr(i + 1, F.length(col)),     # suffix after position i
        ),
    )
    return F.array_union(F.array(col), deletions)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Inner-join rows whose string keys are within ``max_distance`` (only
    1 supported) edits. Returns all left columns + all right columns +
    ``edit_distance``. Candidate pairs come from an equi-join on deletion
    variants; the exact levenshtein verify runs per candidate."""
    if max_distance != 1:
        raise ValueError("fuzzy_join supports max_distance=1 (deletion blocking)")
    lv = left.withColumn(
        "__variant", F.explode(_deletion_variants(F.col(left_col)))
    )
    rv = right.withColumn(
        "__variant", F.explode(_deletion_variants(F.col(right_col)))
    )
    cand = (
        lv.join(rv, "__variant")
        .drop("__variant")
        .dropDuplicates(list(dict.fromkeys(left.columns + right.columns)))
    )
    return cand.withColumn(
        "edit_distance", F.levenshtein(F.col(left_col), F.col(right_col))
    ).filter(F.col("edit_distance") <= max_distance)
