"""Query registry package.

Importing :mod:`blazingsql_spark.queries.registry` and calling
``all_queries()`` loads every query module and returns the full inventory.
"""
