"""Distributed skyline (Pareto-frontier) operator — Börzsönyi et al.,
ICDE'01's skyline query, in the two-phase distributed form (partition-local
skyline, then skyline-of-skylines merge) every later MapReduce treatment
uses (e.g. MR-BNL, Zhang et al. 2009).

Engine extension tier: the reference's comparators can express ORDER BY on
one compound key (Sort.java, KeyFieldBasedComparator), but "best trade-off"
queries — maximize one dimension while minimizing another with no scalar
weighting — need dominance semantics no single sort key encodes. For a
training-data pipeline this is the quality-vs-cost frontier primitive
(e.g. highest-quality-per-token documents, cheapest-largest suppliers).

Scale design (the part that matters at 100 TB):
- Stage 1 collapses the corpus to DISTINCT (x, y) value pairs with counts —
  one map-combinable aggregate; everything after runs on value pairs, never
  rows.
- Stage 2 computes each partition's LOCAL frontier with a running-min
  window keyed by the physical partition id — fully parallel, no data
  movement beyond the pairs already resident. A point dominated inside its
  partition is dominated globally, so pruning is safe; survivors per
  partition are that partition's frontier (typically tiny).
- Stage 3 runs the same sweep globally over the union of local frontiers —
  a single-partition window, but its input is bounded by
  (#partitions x local-frontier size), not the corpus.
Dominance is STRICT Pareto: q dominates p iff q.x >= p.x, q.y <= p.y and
they differ in at least one dimension. The sweep ordered by (x DESC,
y ASC) with a strict running-min comparison realizes exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_front(df: DataFrame, x: str, y: str) -> DataFrame:
    """Pareto frontier maximizing ``x`` while minimizing ``y``.

    Returns the non-dominated DISTINCT value pairs as (x, y, n_rows),
    where n_rows counts corpus rows carrying exactly that pair. For other
    orientations, negate the column at the call site.
    """
    d = df.groupBy(x, y).agg(F.count("*").cast("bigint").alias("n_rows"))

    def sweep(frame: DataFrame, part_cols: list[str]) -> DataFrame:
        w = Window.partitionBy(*part_cols) if part_cols else Window
        w = w.orderBy(F.col(x).desc(), F.col(y).asc()) \
             .rowsBetween(Window.unboundedPreceding, -1)
        return (
            frame.withColumn("_rm", F.min(y).over(w))
            .where(F.col("_rm").isNull() | (F.col(y) < F.col("_rm")))
            .drop("_rm")
        )

    local = sweep(d.withColumn("_pid", F.spark_partition_id()), ["_pid"]).drop("_pid")
    return sweep(local, [])
