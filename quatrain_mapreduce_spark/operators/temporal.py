"""Temporal join operators — as-of join and binned range join.

Engine extensions for the training-data/event tier (no direct reference
analogue; the closest is HOP's continuous-query time handling,
EX/CQ.java:365-398). Spark has no ASOF JOIN and no range-join bin
optimization, so both are expressed as compositions of shuffle-friendly
primitives that survive 100 TB:

- ``asof_join``: union-tag + per-key ordered window + last(ignorenulls).
  ONE hash shuffle on the key and one partition-local sort; the naive
  formulation (inequality theta-join + groupBy argmax) plans as a
  broadcast-nested-loop — quadratic per key and un-runnable at scale.
- ``range_join_binned``: map each interval to the fixed-width bins it
  covers (sequence + explode), each point to its single bin, equi-join on
  the bin id, then re-apply the exact containment predicate. Turns a
  cartesian/BNL plan into a plain hash join whose fan-out per interval is
  ceil(len/bin_width)+1 — the same trick as Databricks' range-join hint,
  available to any Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tie: str | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of the
    latest right row with ``right.ts <= left.ts`` within the same key
    (NULL payload fields when no right row precedes).

    Ties: a right row at exactly left's timestamp IS visible (inclusive
    backward, matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``). Among
    right rows sharing a timestamp the one greatest by ``right_tie`` wins
    (pass a unique column for determinism).

    The payload travels as one struct so ``last(ignorenulls)`` skips only
    absent right rows, never right rows whose individual payload fields are
    NULL.
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__tag", F.lit(1))
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
        *( [F.col(right_tie).alias("__tie")] if right_tie else [] ),
    ).withColumn("__tag", F.lit(0))

    u = lt.unionByName(rt, allowMissingColumns=True)
    order = ["__ts", "__tag"] + (["__tie"] if right_tie else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out_payload = [F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in payload_cols]
    return (
        matched.where(F.col("__tag") == 1)
        .select(*[F.col(c) for c in left.columns], *out_payload)
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    extra_key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join (half-open ``start <= p < end``) via
    fixed-width binning. ``point_col``/``start_col``/``end_col`` must be
    integral (epoch micros for time — exact, no float rounding).

    Without an equi-key Spark plans ``p BETWEEN s AND e`` as a
    broadcast-nested-loop (O(points x intervals)); with bins it is a hash
    join on ``__bin`` (+ ``extra_key``). Pick ``bin_width`` near the typical
    interval length: each interval then lands in 1-2 bins and each point in
    exactly one.
    """
    pt = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_width).cast("long")
    ).alias("pt")
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_width).cast("long"),
                F.floor(F.col(end_col) / bin_width).cast("long"),
            )
        ),
    ).alias("iv")
    cond = (
        (F.col("pt.__bin") == F.col("iv.__bin"))
        & (F.col(f"pt.{point_col}") >= F.col(f"iv.{start_col}"))
        & (F.col(f"pt.{point_col}") < F.col(f"iv.{end_col}"))
    )
    if extra_key:
        cond = cond & (F.col(f"pt.{extra_key}") == F.col(f"iv.{extra_key}"))
    return pt.join(iv, cond, how).drop("__bin")


def scd2_from_events(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_col: str,
    tie_col: str,
    out_attr: str = "state",
) -> DataFrame:
    """Collapse an event stream into SCD-2 validity intervals: one row per
    (key, run of equal ``attr_col``), with ``valid_from``/``valid_to`` event
    times (``valid_to`` NULL on the current interval).

    lag → change-filter → lead, all over the SAME (key, ts, tie) window
    partitioning, so Catalyst plans ONE exchange and sorts once; the
    change-filter between the two window passes shrinks rows before the
    lead. The natural consumer is ``asof_join`` (align a fact stream
    against the interval table) or ``range_join_binned``.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tie_col)
    changed = df.withColumn("__prev", F.lag(attr_col).over(w)).where(
        F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col))
    )
    w2 = Window.partitionBy(key).orderBy(ts_col, tie_col)
    return changed.select(
        F.col(key),
        F.col(attr_col).alias(out_attr),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )
