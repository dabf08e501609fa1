"""blazingsql_spark — a PySpark-native analytics engine with the query surface
of BlazingDB/blazingsql, rebuilt Spark-first.

The reference (BlazingDB/blazingsql) is a distributed GPU SQL engine: a
Calcite frontend plans SQL, a C++ "RAL" engine executes kernel DAGs over cuDF
tables (see SURVEY.md). Here the entire engine is Apache Spark: the public
surface is a thin ``Context`` facade over ``SparkSession`` (mirroring
``pyblazing/pyblazing/apiv2/context.py``), and every reference operator maps
to a Catalyst-planned DataFrame/SQL primitive. Beyond reference parity, the
``functions``/``streaming`` packages add LLM-training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.
"""

from blazingsql_spark.context import Context
from blazingsql_spark.session import get_spark

__all__ = ["Context", "get_spark"]
__version__ = "0.1.0"
