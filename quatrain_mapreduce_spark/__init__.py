"""quatrain_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MapReduce/HOP/Hive stack (basicthinker/Quatrain-MapReduce),
re-expressed Spark-first:

- relational surface (scan/project/filter/join/agg/sort/limit/union/sample)
  as DataFrame / Spark SQL plans optimized by Catalyst,
- the MapReduce operator library (field selection, key-field sort, secondary
  sort, total-order sort, top-k, aggregate package, composite joins,
  multiple inputs/outputs) as declarative DataFrame compositions,
- the HOP streaming/online-aggregation layer as Structured Streaming,
- plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal columns).

See SURVEY.md for the blueprint and the per-operator reference citations.
"""

from quatrain_mapreduce_spark.session import get_spark
from quatrain_mapreduce_spark.catalog import TABLES, load_table, load_tables, register_views
from quatrain_mapreduce_spark.registry import REGISTRY, Query, register, all_queries

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "REGISTRY",
    "Query",
    "register",
    "all_queries",
]
