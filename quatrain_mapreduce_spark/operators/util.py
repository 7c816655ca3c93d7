"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure a CPU-heavy narrow stage runs with cluster-wide parallelism.

    Small inputs (one parquet file < maxPartitionBytes) plan as ONE input
    partition, serializing expensive per-row work (shingling, hashing, dot
    products) onto a single core. Repartition only when the input has fewer
    partitions than the default parallelism — at real scale the scan already
    has thousands of partitions and this is a no-op (no gratuitous shuffle
    of 100 TB of raw text).
    """
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
