"""MERGE INTO / upsert semantics over immutable storage.

Engine extension: the reference's write path is insert-only
(QL/parse/SemanticAnalyzer.java:1991 destinations; no UPDATE/MERGE existed in
2009-era Hive), and plain-parquet Spark has no MERGE either — lakehouse
formats build it on exactly this plan: full-outer join target↔source on the
merge key, source wins where matched, both sides pass through otherwise.

One shuffle on the key (or zero if both sides are bucketed on it —
sinks.write_bucketed_sorted); the output overwrites the target atomically
via the staged-directory pattern the sinks module uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *.

    Columns must match between target and source. Adds ``__merged`` (1 =
    row came from source: updated or inserted) for audit; drop it to get
    pure MERGE output.
    """
    t, s = target.alias("t"), source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    from_source = F.col(f"s.{key}").isNotNull()
    cols = [
        F.when(from_source, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    return joined.select(*cols, from_source.cast("int").alias("__merged"))
