"""Query plans — the engine's acceptance workload (SURVEY.md §2 coverage).

Each module registers queries into quatrain_mapreduce_spark.registry with a
DuckDB oracle where SQL-expressible. ``registry.all_queries()`` imports them.
"""
