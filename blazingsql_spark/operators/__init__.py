"""Custom relational operators Spark lacks as single primitives, composed
from DataFrame ops (never driver-side loops). The reference engine has no
range/as-of/interval joins either (SURVEY §2.2 "No range/as-of/interval
join operators") — these are capability supersets built the Spark way.
"""

from blazingsql_spark.operators.asof import asof_join, range_join
from blazingsql_spark.operators.fuzzy import fuzzy_join
from blazingsql_spark.operators.merge import merge_upsert, scd2_apply
from blazingsql_spark.operators.skew import bucketed_table, salted_join
from blazingsql_spark.operators.packing import pack_documents
from blazingsql_spark.operators.topk import top_k_per_group
from blazingsql_spark.operators.window import global_running

__all__ = [
    "asof_join",
    "fuzzy_join",
    "range_join",
    "top_k_per_group",
    "merge_upsert",
    "scd2_apply",
    "salted_join",
    "bucketed_table",
    "global_running",
    "pack_documents",
]
