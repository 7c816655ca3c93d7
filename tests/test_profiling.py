"""Single-pass table profiling — hand-example with nulls and mixed types."""

import pyspark.sql.functions as F

from quatrain_mapreduce_spark.operators.profiling import profile_table


def test_profile_table_hand_example(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.25, 1_000_000), (2, None, None, 2_000_000),
         (2, "b", 3.0, None)],
        "k long, s string, v double, us long",
    ).select("k", "s", "v", F.timestamp_micros("us").alias("ts"))
    out = {r["column_name"]: r for r in profile_table(df).collect()}
    assert (out["k"]["n_nulls"], out["k"]["n_distinct"],
            out["k"]["min_num"], out["k"]["max_num"]) == (0, 2, 1.0, 2.0)
    assert (out["s"]["n_nulls"], out["s"]["n_distinct"],
            out["s"]["min_str"], out["s"]["max_str"]) == (1, 2, "a", "b")
    assert out["s"]["min_num"] is None
    assert (out["v"]["n_nulls"], out["v"]["min_num"], out["v"]["max_num"]) == (1, 1.25, 3.0)
    # timestamp bounds = exact epoch micros, never strings
    assert (out["ts"]["min_num"], out["ts"]["max_num"]) == (1_000_000.0, 2_000_000.0)
    assert out["ts"]["min_str"] is None


def test_profile_table_is_one_scan(spark):
    df = spark.range(10).select(
        F.col("id"), F.col("id").cast("string").alias("s")
    )
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    # multi-distinct plans through Expand over ONE source scan
    assert plan.count("Range (0, 10") == 1
