"""Triangle counting and CDC log compaction — hand-computed examples."""

import pyspark.sql.functions as F

from quatrain_mapreduce_spark.operators.graph import triangle_counts
from quatrain_mapreduce_spark.operators.merge import cdc_apply


def test_triangle_counts_hand_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus a pendant 4-5
    # and an isolated edge 6-7; duplicates / reversals / self-loop mixed in.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (3, 2),          # reversed duplicate
         (4, 5), (6, 7), (5, 5)],  # pendant, isolated, self-loop
        "src long, dst long",
    )
    out = {r["vertex"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    assert sum(out.values()) // 3 == 4


def test_triangle_counts_star_has_none(spark):
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "src long, dst long"
    )
    assert triangle_counts(edges).count() == 0


def test_cdc_apply_last_write_wins_and_tombstones(spark):
    log = spark.createDataFrame(
        [
            (1, 0, "I", 10.0), (1, 1, "U", 11.0),            # update wins
            (2, 0, "I", 20.0), (2, 1, "D", None),            # tombstoned
            (3, 0, "I", 30.0), (3, 1, "D", None), (3, 2, "I", 33.0),  # re-insert
            (4, 5, "U", 44.0),                               # lone late update
        ],
        "id long, seq int, op string, price double",
    )
    out = {
        r["id"]: (r["price"], r["last_seq"])
        for r in cdc_apply(log, "id", "seq", "op", ["price"]).collect()
    }
    assert out == {1: (11.0, 1), 3: (33.0, 2), 4: (44.0, 5)}


def test_cdc_apply_is_partial_agg_not_window(spark):
    log = spark.createDataFrame(
        [(1, 0, "I", 1.0)], "id long, seq int, op string, price double"
    )
    plan = (
        cdc_apply(log, "id", "seq", "op", ["price"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # map-side combinable aggregate (partial_max_by BELOW the exchange
    # pre-compacts each partition), not a full-log-shuffling window
    partial = plan.index("partial_max_by")
    exchange = plan.index("Exchange")
    assert exchange < partial  # plan prints top-down: partial is upstream
    assert "Window" not in plan
