"""Operator library — Spark-first re-expressions of the reference's
MapReduce lib (`src/mapred/org/apache/hadoop/mapred/lib`), join framework,
aggregate package, and the LLM-data-pipeline extensions (dedup, similarity,
text analysis, multimodal).

Every function is DataFrame -> DataFrame (declarative, Catalyst-optimizable);
no driver-side loops, no collect() in any operator path.
"""
