"""As-of join and binned range join — semantics + physical-plan shape."""

import pyspark.sql.functions as F
import pytest

from quatrain_mapreduce_spark.operators.curation import gopher_rules
from quatrain_mapreduce_spark.operators.similarity import quantize_embeddings
from quatrain_mapreduce_spark.operators.temporal import asof_join, range_join_binned


@pytest.fixture(scope="module")
def ab(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 200), (3, "u1", 50), (4, "u2", 500)],
        "id long, user string, ts long",
    )
    right = spark.createDataFrame(
        [(10, "u1", 100, 1.0), (11, "u1", 150, None), (12, "u3", 10, 9.9)],
        "rid long, user string, ts long, val double",
    )
    return left, right


def test_asof_backward_inclusive_and_nulls(ab):
    left, right = ab
    out = asof_join(
        left, right, key="user", left_ts="ts", right_ts="ts",
        payload_cols=["rid", "val"], right_tie="rid",
    )
    rows = {r["id"]: (r["r_rid"], r["r_val"]) for r in out.collect()}
    # ts=100 matches the rid=10 row AT the same timestamp (inclusive)
    assert rows[1] == (10, 1.0)
    # ts=200 sees the later rid=11 row whose payload val is NULL — the
    # struct must carry the row (not skip to rid=10 via ignorenulls)
    assert rows[2] == (11, None)
    # ts=50 precedes every right row; u2 has no right rows at all
    assert rows[3] == (None, None)
    assert rows[4] == (None, None)


def test_asof_single_shuffle(ab):
    left, right = ab
    out = asof_join(
        left, right, key="user", left_ts="ts", right_ts="ts",
        payload_cols=["rid"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + window = exactly one hash-partitioning exchange on the key;
    # an inequality-join formulation would show BroadcastNestedLoopJoin
    assert plan.count("Exchange hashpartitioning") == 1
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_binned_exact_and_plan(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 19), (4, 20), (5, 35)], "pid long, p long"
    )
    intervals = spark.createDataFrame(
        [(100, 10, 20), (101, 0, 40), (102, 25, 26)], "iid long, s long, e long"
    )
    out = range_join_binned(points, intervals, "p", "s", "e", bin_width=10)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # half-open [s, e): p=10 in [10,20) but p=20 not; 101 covers all but 35>=40 false -> 35<40 true
    assert got == sorted(
        [(1, 101), (2, 100), (2, 101), (3, 100), (3, 101), (4, 101), (5, 101)]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_gopher_rules_empty_and_passing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "the cat of a mat and to sat the end"), (3, "$$ %% @@ !! ^^ && ** (( )) __")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(df, "text").collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["passes"] == 0
    assert rows[2]["passes"] == 1 and rows[2]["stop_hits"] >= 2
    # all-symbol doc: symbol_frac 1.0 fails the gate
    assert rows[3]["symbol_frac"] == 1.0 and rows[3]["passes"] == 0


def test_quantize_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df, "vec_id", "embedding").collect()}
    r1 = rows[1]
    assert r1["q_max_abs"] == 127  # max-magnitude element hits the int8 rail
    # reconstruction error bounded by half a quantization step
    # both sides 9dp-rounded, so allow the last-digit slack
    assert r1["max_err"] <= r1["scale"] / 2 + 1e-8
    assert rows[2]["scale"] == 0.0 and rows[2]["q_sum"] == 0 and rows[2]["max_err"] == 0.0
