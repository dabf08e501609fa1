"""Beyond-reference data-pipeline operators (LLM-training-data toolkit).

The reference engine has no text-analysis, dedup, similarity, or multimodal
operators — these are the north-star extensions (BASELINE.json), built
Spark-first: JVM-side expressions wherever possible, Arrow-batched Pandas
UDFs only where semantics require, and partition-aware designs for 100 TB.
"""

from blazingsql_spark.functions import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
