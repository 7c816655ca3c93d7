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


def test_scd2_runs_and_single_exchange(spark):
    from quatrain_mapreduce_spark.operators.temporal import scd2_from_events

    ev = spark.createDataFrame(
        [(1, "u", 10, "a"), (2, "u", 20, "a"), (3, "u", 30, "b"),
         (4, "u", 40, "b"), (5, "u", 50, "a"), (6, "v", 5, "x")],
        "eid long, user string, ts long, state string",
    )
    out = scd2_from_events(ev, "user", "ts", "state", tie_col="eid")
    got = sorted(
        (r["user"], r["state"], r["valid_from"], r["valid_to"])
        for r in out.collect()
    )
    # runs collapse: u has a[10,30) b[30,50) a[50,None); v has x[5,None)
    assert got == [
        ("u", "a", 10, 30), ("u", "a", 50, None), ("u", "b", 30, 50),
        ("v", "x", 5, None),
    ]
    # lag + lead share the (user, ts, eid) partitioning: one exchange.
    # Compile with AQE off — its coalesced shuffle read re-partitions at toy
    # row counts, which says nothing about the operator's shape.
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            scd2_from_events(ev, "user", "ts", "state", tie_col="eid")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_join_matches_plain_join(spark):
    from quatrain_mapreduce_spark.operators.joins import salted_join

    big = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(100)], "id long, k long, v double"
    )
    small = spark.createDataFrame([(0, "x"), (1, "y")], "k long, name string")
    got = sorted(
        (r["id"], r["k"], r["name"])
        for r in salted_join(big, small, "k", n_salts=4).collect()
    )
    want = sorted(
        (r["id"], r["k"], r["name"]) for r in big.join(small, "k").collect()
    )
    assert got == want and len(got) == 67  # k in {0,1} only


def test_merge_upsert_update_insert_passthrough(spark):
    from quatrain_mapreduce_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    rows = {r["id"]: r for r in merge_upsert(target, source, "id").collect()}
    assert len(rows) == 4
    assert rows[2]["name"] == "B" and rows[2]["__merged"] == 1  # updated
    assert rows[4]["v"] == 40.0 and rows[4]["__merged"] == 1    # inserted
    assert rows[1]["name"] == "a" and rows[1]["__merged"] == 0  # untouched


def test_activity_profile_knn_hand_example(spark):
    """Users 1 and 2 share the same single-hour profile (cos=1.0); user 3
    is active in a disjoint hour (no shared bucket -> no pair row)."""
    from datetime import datetime

    from quatrain_mapreduce_spark.operators.similarity import activity_profile_knn

    rows = [
        (1, datetime(2024, 1, 1, 9, 5)), (1, datetime(2024, 1, 2, 9, 30)),
        (2, datetime(2024, 1, 1, 9, 59)),
        (3, datetime(2024, 1, 1, 15, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["id_a"], r["id_b"]): r
           for r in activity_profile_knn(df, "user_id", "ts", k=3).collect()}
    # both directions for the 1<->2 pair, nothing involving 3
    assert set(got) == {(1, 2), (2, 1)}
    assert got[(1, 2)]["dot_ab"] == 2          # (2 events)·(1 event) in hour 9
    assert got[(1, 2)]["cos_r"] == 1.0
    assert got[(1, 2)]["rk"] == 1


def test_funnel_counts_strict_order(spark):
    """User 1 completes view->click->purchase in order; user 2 clicks
    BEFORE viewing (click doesn't count) and never purchases; user 3 only
    views. Counts must be monotone down the funnel."""
    from datetime import datetime as dt

    from quatrain_mapreduce_spark.operators.temporal import funnel_counts

    rows = [
        (1, dt(2024, 1, 1, 9), "view"), (1, dt(2024, 1, 1, 10), "click"),
        (1, dt(2024, 1, 1, 11), "purchase"),
        (2, dt(2024, 1, 1, 8), "click"), (2, dt(2024, 1, 1, 9), "view"),
        (3, dt(2024, 1, 1, 9), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["stage"]: r["n_users"] for r in
           funnel_counts(df, "user_id", "ts", "event_type",
                         ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_cohort_retention_triangle(spark):
    """Two users sign up in week W; one is active in W+1. Offsets and
    ratios follow."""
    from datetime import datetime as dt

    from quatrain_mapreduce_spark.operators.temporal import cohort_retention

    rows = [
        (1, dt(2024, 1, 1), "signup"), (2, dt(2024, 1, 2), "signup"),
        (1, dt(2024, 1, 9), "click"),   # next epoch-week
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["week_offset"]: r for r in
           cohort_retention(df, "user_id", "ts", "event_type", "signup").collect()}
    assert got[0]["n_active"] == 2 and got[0]["cohort_size"] == 2
    assert got[0]["ret_r"] == 1.0
    assert got[1]["n_active"] == 1 and got[1]["ret_r"] == 0.5


def test_interval_overlap_join_hand_example(spark, tmp_path):
    import pyspark.sql.functions as F
    H = 3600 * 1_000_000
    M = 60 * 1_000_000
    rows = []
    eid = 0

    def ev(user, us, typ):
        nonlocal eid
        eid += 1
        rows.append((eid, us, user, typ))

    # hour 0: user 1 alone, 2 views -> NOT busy, span [10m, 20m+1us)
    ev(1, 10 * M, "view")
    ev(1, 20 * M, "view")
    # hours 1..3: 5 clicks each from disjoint users -> one MERGED busy
    # window [1h, 4h) for 'click' (gaps-and-islands coalescing)
    users = iter(range(2, 18))
    for h in (1, 2, 3):
        for _ in range(5):
            ev(next(users), h * H, "click")
    # user 100: span [1h30m, 3h30m+1us) crosses the merged window interior
    ev(100, H + 30 * M, "view")
    ev(100, 3 * H + 30 * M, "view")
    spark.createDataFrame(
        rows, "event_id long, us long, user_id long, event_type string"
    ).select("event_id", F.timestamp_micros("us").alias("ts"),
             "user_id", "event_type").write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = all_queries()["interval_overlap_join"].fn(
        spark, str(tmp_path)).collect()
    assert len(out) == 16  # 15 click-point spans + user 100; user 1 absent
    assert all(r["overlap_us"] > 0 for r in out)
    assert all(r["window_start_us"] == H and r["event_type"] == "click"
               for r in out)
    assert not any(r["user_id"] == 1 for r in out)
    [u100] = [r for r in out if r["user_id"] == 100]
    # min(3h30m+1us, 4h) - max(1h30m, 1h) = exactly 2h + 1us
    assert u100["overlap_us"] == 2 * H + 1


def test_attribution_multitouch_hand_example(spark, tmp_path):
    import pyspark.sql.functions as F
    D = 86400 * 1_000_000
    rows = [
        # user 1: clicks 11@100us, 12@200us; purchases 21@250us, 22@150us
        (11, 100, 1, "click"), (12, 200, 1, "click"),
        (21, 250, 1, "purchase"), (22, 150, 1, "purchase"),
        # user 2: 3 clicks -> 333333 each, +1 remainder to the LATEST
        (31, 10, 2, "click"), (32, 20, 2, "click"), (33, 30, 2, "click"),
        (41, 40, 2, "purchase"),
        # user 3: click outside the 7-day lookback -> no credit row
        (51, 0, 3, "click"), (61, 8 * D, 3, "purchase"),
    ]
    spark.createDataFrame(
        rows, "event_id long, us long, user_id long, event_type string"
    ).select("event_id", F.timestamp_micros("us").alias("ts"),
             "user_id", "event_type").write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {(r["user_id"], r["click_id"]): (r["credit_ppm"], r["n_purchases"])
           for r in all_queries()["attribution_multitouch"].fn(
               spark, str(tmp_path)).collect()}
    assert out == {
        (1, 11): (1_500_000, 2),  # 500k from purchase 21 + full 1M from 22
        (1, 12): (500_000, 1),
        (2, 31): (333_333, 1), (2, 32): (333_333, 1),
        (2, 33): (333_334, 1),  # remainder lands on the latest touch
    }
    # conservation: every attributed purchase hands out exactly 1e6 ppm
    assert sum(c for c, _ in out.values()) == 3 * 1_000_000


def test_concurrency_peaks_hand_example(spark, tmp_path):
    import pyspark.sql.functions as F
    # spans (from event min/max+1): u1 [0,10), u2 [5,15), u3 [20,30),
    # u4 [15,20) — u4 STARTS exactly where u2 ends: half-open sweep must
    # not count them concurrent. Peak = 2, first reached at t=5.
    rows = [(1, 1, 0), (2, 1, 9), (3, 2, 5), (4, 2, 14),
            (5, 3, 20), (6, 3, 29), (7, 4, 15), (8, 4, 19)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, us long"
    ).select("event_id", "user_id",
             F.timestamp_micros("us").alias("ts")).write.mode(
        "overwrite").parquet(str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    [r] = all_queries()["concurrency_peaks"].fn(spark, str(tmp_path)).collect()
    assert (r["day"], r["max_concurrent"], r["at_us"]) == (0, 2, 5)


def test_dau_wau_stickiness_hand_example(spark, tmp_path):
    import pyspark.sql.functions as F
    D = 86400 * 1_000_000
    # week 0: users {1,2} on day 0, user {1} on day 1 -> dau_sum 3,
    # n_days 2, wau 2 -> stickiness = 3e6 div (2*2) = 750000
    rows = [(1, 1, 0), (2, 1, 1), (3, 2, 100), (4, 1, D), (5, 1, D + 5)]
    spark.createDataFrame(
        rows, "event_id long, user_id long, us long"
    ).select("event_id", "user_id",
             F.timestamp_micros("us").alias("ts")).write.mode(
        "overwrite").parquet(str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    [r] = all_queries()["dau_wau_stickiness"].fn(spark, str(tmp_path)).collect()
    assert (r["week"], r["n_days"], r["dau_sum"], r["wau"]) == (0, 2, 3, 2)
    assert r["stickiness_ppm"] == 750_000


def test_scd2_null_state_is_a_real_state(spark):
    """A NULL attr value must open its own interval, not be dropped (the
    plain != change filter silently lost it and split the surrounding run
    into duplicate adjacent intervals — review finding)."""
    from quatrain_mapreduce_spark.operators.temporal import scd2_from_events

    df = spark.createDataFrame(
        [(1, 10, "A", 1), (1, 20, None, 2), (1, 30, "A", 3)],
        "k long, ts long, st string, e long",
    )
    rows = sorted(
        (r["valid_from"], r["state"], r["valid_to"])
        for r in scd2_from_events(df, "k", "ts", "st", "e").collect()
    )
    assert rows == [(10, "A", 20), (20, None, 30), (30, "A", None)]


def test_salted_join_rejects_small_side_preserving_joins(spark):
    """Right/full joins would keep an unmatched small row once per salt
    replica; the operator must refuse rather than silently duplicate."""
    import pytest

    from quatrain_mapreduce_spark.operators.joins import salted_join

    big = spark.createDataFrame([(1, "x")], "k long, a string")
    small = spark.createDataFrame([(1, "y"), (2, "z")], "k long, b string")
    with pytest.raises(ValueError, match="salt replica"):
        salted_join(big, small, "k", n_salts=4, how="full")
    # left_anti stays valid: the small side is complete at every salt
    got = salted_join(big.union(spark.createDataFrame([(3, "w")], big.schema)),
                      small, "k", n_salts=4, how="left_anti").collect()
    assert [(r["k"]) for r in got] == [3]


def test_merge_upsert_null_source_key_inserts(spark):
    """SQL MERGE semantics: a NULL merge key never matches, so the source
    row INSERTs — the old s.key-IS-NOT-NULL discriminator emitted an
    all-NULL row classified as target (review finding)."""
    from quatrain_mapreduce_spark.operators.merge import merge_upsert

    t = spark.createDataFrame([(1, "old")], "k long, v string")
    s = spark.createDataFrame([(None, "nullkey"), (1, "new")], "k long, v string")
    rows = sorted(
        ((r["k"], r["v"], r["__merged"]) for r in merge_upsert(t, s, "k").collect()),
        key=str,
    )
    assert (None, "nullkey", 1) in rows
    assert (1, "new", 1) in rows
    assert len(rows) == 2


def test_range_join_binned_exact_at_large_keys(spark):
    """Bin assignment must be integer floor division: double division
    misbins keys above ~2^53 and silently drops matches (review finding).
    p = k*w - 1 with k*w near 2^60 rounds UP under double division."""
    from quatrain_mapreduce_spark.operators.temporal import range_join_binned

    w = 3600 * 1000 * 1000  # 1h in micros
    k = (1 << 60) // w
    p = k * w - 1           # belongs to bin k-1
    points = spark.createDataFrame([(1, p)], "pid long, ts long")
    ivals = spark.createDataFrame(
        [(10, (k - 1) * w, k * w)], "iid long, s long, e long"
    )
    got = range_join_binned(points, ivals, "ts", "s", "e", w).collect()
    assert len(got) == 1 and got[0]["iid"] == 10
