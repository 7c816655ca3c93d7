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


def test_profile_table_plan_is_hash_only(spark):
    # r13 optimization: exact distinct runs as per-column keys-only hash
    # aggregates — never the single-agg multi-COUNT(DISTINCT) form, whose
    # Expand + string-min/max buffers degrade to SortAggregate over a full
    # sort of k row-replicas of the table
    df = spark.range(10).select(
        F.col("id"), F.col("id").cast("string").alias("s")
    )
    plan = (
        profile_table(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    # the basics aggregate keeps a keys-[] SortAggregate (string min/max
    # buffers; with no grouping keys it sorts nothing) — what must be gone
    # is any actual Sort operator and any keyed sort-based aggregation
    assert "Sort [" not in plan
    assert "SortAggregate(key=[id" not in plan
    # one pruned scan per distinct branch + one for the basics aggregate
    assert plan.count("Range (0, 10") == 3


def test_profile_table_nulls_not_counted_as_distinct(spark):
    # COUNT(DISTINCT c) ignores nulls; the keys-only-dedup formulation must
    # match (a NULL key would otherwise survive distinct() and count +1)
    df = spark.createDataFrame(
        [(None,), (None,), ("a",)], "s string"
    )
    [r] = profile_table(df).collect()
    assert (r["n_nulls"], r["n_distinct"]) == (2, 1)


def test_record_linkage_fuzzy_planted_pair(spark, tmp_path):
    rows = [
        (1, "Customer#000000001", 5),
        (2, "Customer#000000002", 5),   # dist 1 from id 1
        (3, "Customer#000000012", 5),   # dist 2 from id 1, dist 1 from id 2
        (4, "Customer#000000001", 9),   # identical name, different block
        (5, "Totally#Different!!", 5),
    ]
    spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {(r["id_a"], r["id_b"]): r["dist"]
           for r in all_queries()["record_linkage_fuzzy"].fn(
               spark, str(tmp_path)).collect()}
    # cross-block identical pair (1,4) must NOT appear: blocking is a
    # recall tradeoff by design
    assert out == {(1, 2): 1, (1, 3): 2, (2, 3): 1}


def test_incremental_rollup_reuses_staged_history(spark):
    import os
    from quatrain_mapreduce_spark.registry import all_queries
    from quatrain_mapreduce_spark.staging import stage_dir

    sf = "/root/testdata/sf0.001"
    q = all_queries()["incremental_rollup_merge"].fn
    q(spark, sf).count()
    d = stage_dir(sf, "rollup20")
    stamp = os.path.getmtime(os.path.join(d, "_SUCCESS"))
    n = q(spark, sf).count()  # second serve: history parquet reused as-is
    assert os.path.getmtime(os.path.join(d, "_SUCCESS")) == stamp
    assert n > 0


def test_integrity_report_planted_violations(spark, tmp_path):
    import pyspark.sql.functions as F
    # orders: duplicate PK (1 twice), FK orphan (custkey 99), negative price
    spark.createDataFrame(
        [(1, 10, "O", 5.0, 0, "x"), (1, 10, "O", 6.0, 0, "x"),
         (2, 99, "F", -1.0, 0, "x"), (3, 11, "F", 7.0, 0, "x")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, us long, o_orderpriority string",
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
             F.timestamp_micros("us").alias("o_orderdate"),
             "o_orderpriority").write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, "Customer#10", 0), (11, "Customer#11", 0)],
        "c_custkey long, c_name string, c_nationkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    # lineitem: one orphan orderkey (7), one discount out of range
    spark.createDataFrame(
        [(1, 1.0, 0.05), (7, 1.0, 0.05), (3, 1.0, 1.5)],
        "l_orderkey long, l_quantity double, l_discount double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {r["constraint_name"]: r["n_violations"]
           for r in all_queries()["integrity_report"].fn(
               spark, str(tmp_path)).collect()}
    assert out == {"orders_pk_dup": 1, "orders_fk_customer": 1,
                   "lineitem_fk_orders": 1, "orders_price_nonneg": 1,
                   "lineitem_disc_range": 1}


def test_missing_hours_hand_gaps(spark, tmp_path):
    import pyspark.sql.functions as F
    h = 3600 * 1_000_000
    # span hours 0..3; type A present 0,3 (missing 1,2); type B present 1
    # (missing 0,2,3)
    rows = [(1, "A", 0), (2, "A", 3 * h), (3, "B", 1 * h)]
    spark.createDataFrame(
        rows, "event_id long, event_type string, us long"
    ).select("event_id", "event_type",
             F.timestamp_micros("us").alias("ts")).write.mode(
        "overwrite").parquet(str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {r["event_type"]: (r["n_missing"], r["missing_hour_sum"],
                             r["n_expected"])
           for r in all_queries()["missing_hours"].fn(
               spark, str(tmp_path)).collect()}
    assert out == {"A": (2, 3, 4), "B": (3, 5, 4)}


def test_tpch_q18_plan_semi_join_and_top100(spark):
    from quatrain_mapreduce_spark.registry import all_queries
    df = all_queries()["tpch_q18_shape"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "LeftSemi" in plan


def test_stream_cdc_apply_matches_batch_compaction(spark):
    import glob
    import os
    from quatrain_mapreduce_spark.registry import all_queries
    from quatrain_mapreduce_spark.staging import stage_dir

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    stream_rows = sorted(
        tuple(r) for r in qs["stream_cdc_apply"].fn(spark, sf).collect()
    )
    batch_rows = sorted(
        tuple(r) for r in qs["cdc_apply_orders"].fn(spark, sf).collect()
    )
    assert stream_rows == batch_rows and len(stream_rows) > 0
    # incremental evidence: one versioned snapshot per micro-batch
    vers = sorted(glob.glob(os.path.join(stage_dir(sf, "cdctarget"), "v*")))
    assert len(vers) == 4


def test_trend_slope_exact_line(spark, tmp_path):
    import pyspark.sql.functions as F
    h = 3600 * 1_000_000
    # type L: value = 2.00 * hour -> slope exactly 200 cents/hour;
    # type C: constant -> slope exactly 0
    rows = [(1, "L", 0, 0.0), (2, "L", 1 * h, 2.0), (3, "L", 2 * h, 4.0),
            (4, "C", 0, 5.0), (5, "C", 2 * h, 5.0)]
    spark.createDataFrame(
        rows, "event_id long, event_type string, us long, value double"
    ).select("event_id", "event_type",
             F.timestamp_micros("us").alias("ts"), "value").write.mode(
        "overwrite").parquet(str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {r["event_type"]: r["slope_cents_per_hour"]
           for r in all_queries()["trend_slope"].fn(
               spark, str(tmp_path)).collect()}
    assert out == {"L": 200.0, "C": 0.0}


def test_analyze_table_stats_reach_catalyst(spark, tmp_path):
    # ANALYZE TABLE row counts must land in the optimizer's Statistics —
    # the CBO input that drives join reordering / broadcast choice at scale
    spark.sql("CREATE DATABASE IF NOT EXISTS qms_statdb")
    spark.range(1234).write.mode("overwrite").saveAsTable(
        "qms_statdb.stats_demo"
    )
    prev = spark.conf.get("spark.sql.cbo.enabled")
    try:
        spark.sql("ANALYZE TABLE qms_statdb.stats_demo COMPUTE STATISTICS")
        # rowCount propagates into plan Statistics only under CBO
        spark.conf.set("spark.sql.cbo.enabled", "true")
        stats = (
            spark.table("qms_statdb.stats_demo")
            ._jdf.queryExecution().optimizedPlan().stats()
        )
        assert stats.rowCount().isDefined()
        assert stats.rowCount().get() == 1234
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
        spark.sql("DROP TABLE IF EXISTS qms_statdb.stats_demo")
        spark.sql("DROP DATABASE IF EXISTS qms_statdb")


def test_profile_table_approx_has_no_expand(spark):
    # the point of the 100 TB swap: HLL distinct is a single-scan,
    # Expand-free aggregate — no row replicas, no per-column re-scans
    # (the exact form's remaining per-column cost after the r13 rewrite)
    from quatrain_mapreduce_spark.operators.profiling import (
        profile_distinct_gated, profile_table_approx,
    )
    df = spark.range(10).select(
        F.col("id"), F.col("id").cast("string").alias("s")
    )
    # the acceptance harness still carries exact multi-COUNT(DISTINCT)
    # alongside the sketch, so Expand remains the cost it demonstrates
    gated_plan = profile_distinct_gated(df)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile_table_approx(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in gated_plan        # the cost the swap removes
    assert "Expand" not in approx_plan   # sketch partials, no row replicas
    assert approx_plan.count("Range (0, 10") == 1  # still one scan


def test_profile_distinct_gated_hand_example(spark):
    from quatrain_mapreduce_spark.operators.profiling import (
        profile_distinct_gated,
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, s string"
    )
    out = {r["column_name"]: r for r in profile_distinct_gated(df).collect()}
    assert (out["k"]["n_nulls"], out["k"]["n_distinct"], out["k"]["dist_ok"]) == (0, 2, 1)
    assert (out["s"]["n_nulls"], out["s"]["n_distinct"], out["s"]["dist_ok"]) == (1, 2, 1)


def test_anomaly_mad_approx_pipeline_matches_exact_at_test_scale(spark):
    from quatrain_mapreduce_spark.registry import all_queries
    rows = all_queries()["anomaly_mad_approx"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    assert all(r["med_ok"] == 1 and r["mad_ok"] == 1 for r in rows)


def test_auc_mann_whitney_hand_example(spark, tmp_path):
    import pyspark.sql.functions as F
    # positives (purchase) cents {3, 1}; negatives (click) cents {2, 1}
    # pairwise: 3>2 win, 3>1 win, 1<2 loss, 1=1 tie(0.5) -> AUC = 2.5/4
    rows = [(1, "purchase", 0.03), (2, "purchase", 0.01),
            (3, "click", 0.02), (4, "click", 0.01),
            (5, "view", 9.99)]  # other types must be ignored
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    [r] = all_queries()["auc_mann_whitney"].fn(spark, str(tmp_path)).collect()
    assert (r["np"], r["nn"]) == (2, 2)
    assert r["auc_num2"] == 5  # 2U, ties count once in doubled space
    assert r["auc"] == 0.625


def test_spearman_hand_examples(spark, tmp_path):
    # perfect inverse monotone (nonlinear spacing is irrelevant to rank corr)
    from quatrain_mapreduce_spark.registry import all_queries
    qs = all_queries()

    def run(pairs):
        rows = [(float(q), float(p)) for q, p in pairs]
        spark.createDataFrame(
            rows, "l_quantity double, l_extendedprice double"
        ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
        [r] = qs["spearman_rank_corr"].fn(spark, str(tmp_path)).collect()
        return r

    r = run([(1, 99.0), (2, 5.0), (3, 0.01)])
    assert r["rho"] == -1.0 and r["n"] == 3
    # tie-averaged ranks: tied q values carry tied p values -> still rho=1
    r = run([(1, 0.05), (1, 0.05), (2, 0.09), (3, 0.10)])
    assert r["rho"] == 1.0
    assert int(r["cov_num"]) > 0


def test_basket_affinity_hand_example(spark, tmp_path):
    # 6 orders contain categories {1,2}; a 7th holds only 1; a duplicate
    # (order, part) row must NOT inflate counts (DISTINCT basket semantics)
    rows = [(ok, cat) for ok in range(1, 7) for cat in (1, 2)]
    rows += [(7, 1), (1, 1)]  # 7th basket + duplicate row in order 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    [r] = all_queries()["basket_affinity"].fn(spark, str(tmp_path)).collect()
    assert (r["cat_a"], r["cat_b"], r["n_ab"], r["n_a"], r["n_b"]) == (
        1, 2, 6, 7, 6)
    assert r["support_ppm"] == 857142  # 6_000_000 div 7
    assert r["confidence"] == 0.857143  # 6/7 rounded half-up at 6dp
    assert r["lift"] == 1.0  # 7*6 / (7*6)


def test_calibration_bins_hand_example(spark, tmp_path):
    # cents span exactly 0..9 -> width 10, so bin == cents (exact edges)
    rows = [(1, "click", 0.00), (2, "click", 0.00), (3, "purchase", 0.00),
            (4, "purchase", 0.09), (5, "purchase", 0.09),
            (6, "view", 0.05)]  # ignored type
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {r["bin"]: r for r in all_queries()["calibration_bins"].fn(
        spark, str(tmp_path)).collect()}
    assert set(out) == {0, 9}
    assert (out[0]["n"], out[0]["n_pos"]) == (3, 1)
    assert out[0]["pos_rate"] == 0.333333  # floor(1/3 * 1e6 + 0.5)/1e6
    assert out[0]["mean_cents"] == 0.0
    assert (out[9]["n"], out[9]["n_pos"], out[9]["pos_rate"]) == (2, 2, 1.0)
    assert out[9]["mean_cents"] == 9.0


def test_cusum_changepoint_hand_example(spark, tmp_path):
    import pyspark.sql.functions as F
    H = 3600 * 1_000_000
    # type A: rate 1/hour for hours 0-3, then 5/hour for hours 4-7 ->
    # |n*S_k - k*S| peaks at k=4 (hour 3), the last pre-shift point
    rows = []
    eid = 0
    for h in range(8):
        for _ in range(1 if h < 4 else 5):
            eid += 1
            rows.append((eid, h * H, "A"))
    spark.createDataFrame(
        rows, "event_id long, us long, event_type string"
    ).select("event_id", F.timestamp_micros("us").alias("ts"),
             "event_type").write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    [r] = all_queries()["cusum_changepoint"].fn(spark, str(tmp_path)).collect()
    assert (r["event_type"], r["n_points"]) == ("A", 8)
    assert r["cp_hour"] == 3
    assert r["cusum_num"] == 64  # |8*4 - 4*24| with S_4=4, S=24


def test_benford_digits_hand_example(spark, tmp_path):
    # cents 100, 100, 900 -> digits 1,1,9; all other digits report n=0
    rows = [(1, 1.00), (2, 1.00), (3, 9.00), (4, 0.0)]  # 0 excluded
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from quatrain_mapreduce_spark.plans.analytics_queries import _BENFORD_PPM
    from quatrain_mapreduce_spark.registry import all_queries
    out = {r["digit"]: r for r in all_queries()["benford_digits"].fn(
        spark, str(tmp_path)).collect()}
    assert set(out) == {str(d) for d in range(1, 10)}
    counts = {"1": 2, "9": 1}
    total = 3
    for d in range(1, 10):
        r = out[str(d)]
        n = counts.get(str(d), 0)
        e = _BENFORD_PPM[d - 1]
        assert r["n"] == n and r["expected_ppm"] == e
        dev = n * 1_000_000 - total * e
        assert r["chi_term_scaled"] == (dev * dev) // (total * e)


def test_gini_spend_hand_examples(spark, tmp_path):
    from quatrain_mapreduce_spark.registry import all_queries
    qs = all_queries()

    def run(totals):
        rows = [(i, i, float(t)) for i, t in enumerate(totals)]
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double"
        ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        [r] = qs["gini_spend"].fn(spark, str(tmp_path)).collect()
        return r

    r = run([1.00, 1.00, 4.00])  # sorted (100,100,400): G = 600/1800
    assert (r["n_customers"], r["total_cents"]) == (3, "600")
    assert r["gini"] == 0.333333
    r = run([2.50] * 5)  # perfect equality
    assert r["gini"] == 0.0


def test_k_core_hand_graph_and_python_parity(spark, sf_dir):
    from quatrain_mapreduce_spark.operators.graph import k_core_vertices
    # K4 on {1,2,3,4} + pendant chain 4-5-6: the 3-core is exactly K4
    e = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e += [(4, 5), (5, 6)]
    edges = spark.createDataFrame(e, "src long, dst long")
    out = {r["vertex"]: r["core_degree"]
           for r in k_core_vertices(edges, k=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # independent pure-Python peel over the sf0.001 co-purchase graph
    from quatrain_mapreduce_spark.registry import all_queries
    got = {r["vertex"]: r["core_degree"]
           for r in all_queries()["k_core_members"].fn(
               spark, sf_dir).collect()}
    import pyspark.sql.functions as F
    from quatrain_mapreduce_spark.catalog import load_table
    ev = load_table(spark, sf_dir, "events")
    bip = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("u"),
            (F.get_json_object("props", "$.k").cast("int") * 100
             + F.expr("CAST(unix_micros(ts) div 86400000000 AS INT) % 30")
             ).alias("item"))
        .distinct())
    x, y = bip.alias("x"), bip.alias("y")
    pairs = (x.join(y, (F.col("x.item") == F.col("y.item"))
                    & (F.col("x.u") < F.col("y.u")))
             .select(F.col("x.u").alias("src"), F.col("y.u").alias("dst"))
             .distinct().collect())
    adj = {}
    for r in pairs:
        adj.setdefault(r["src"], set()).add(r["dst"])
        adj.setdefault(r["dst"], set()).add(r["src"])
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < 3]:
            for n in adj.pop(v):
                adj[n].discard(v)
            changed = True
    want = {v: len(ns) for v, ns in adj.items()}
    assert got == want


def test_incremental_join_reuses_staged_view_and_broadcasts_dim_delta(spark):
    import os
    from quatrain_mapreduce_spark.registry import all_queries
    from quatrain_mapreduce_spark.staging import stage_dir

    sf = "/root/testdata/sf0.001"
    q = all_queries()["incremental_join_merge"].fn
    q(spark, sf).count()
    d = stage_dir(sf, "joinview97")
    stamp = os.path.getmtime(os.path.join(d, "_SUCCESS"))
    df = q(spark, sf)
    n = df.count()  # second serve: history-x-history parquet reused as-is
    assert os.path.getmtime(os.path.join(d, "_SUCCESS")) == stamp
    assert n > 0
    # the late-dim delta term must probe as a broadcast join
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_trend_break_slopes_hand_example(spark, tmp_path):
    import pyspark.sql.functions as F
    H = 3600 * 1_000_000
    # type A: 1 event/hour for hours 0-3, then ramp 2,4,6,8 for hours 4-7.
    # |n*S_k - k*S| peaks at k=5 (hour 4, one point INTO the ramp — the
    # centered statistic's true argmax, hand-computed): pre = hours 0-4
    # (counts 1,1,1,1,2 -> slope 10/50 = 0.2), post = hours 5-7
    # (counts 4,6,8 -> slope exactly 2)
    rows = []
    eid = 0
    counts = [1, 1, 1, 1, 2, 4, 6, 8]
    for h, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append((eid, h * H, "A"))
    spark.createDataFrame(
        rows, "event_id long, us long, event_type string"
    ).select("event_id", F.timestamp_micros("us").alias("ts"),
             "event_type").write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {r["side"]: r for r in all_queries()["trend_break_slopes"].fn(
        spark, str(tmp_path)).collect()}
    assert set(out) == {"pre", "post"}
    assert out["pre"]["cp_x"] == out["post"]["cp_x"] == 4
    assert out["pre"]["slope"] == 0.2
    assert out["post"]["slope"] == 2.0
    assert out["pre"]["n"] + out["post"]["n"] == 8


def test_fd_violations_hand_example(spark, tmp_path):
    # part 1 -> suppliers {10, 11} (violation, fanout 2); part 2 -> {10}
    # order 5 -> returnflags {'R'} (holds); order 6 -> {'R', 'A'} (violates)
    li = [(1, 10, 5, "R"), (1, 11, 5, "R"), (2, 10, 6, "R"), (2, 10, 6, "A")]
    spark.createDataFrame(
        li, "l_partkey long, l_suppkey long, l_orderkey long, "
            "l_returnflag string"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    od = [(1, 7, "1-URGENT"), (2, 7, "3-MEDIUM"), (3, 8, "1-URGENT")]
    spark.createDataFrame(
        od, "o_orderkey long, o_custkey long, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from quatrain_mapreduce_spark.registry import all_queries
    out = {r["fd"]: (r["n_keys"], r["n_violating"], r["violation_ppm"],
                     r["max_distinct"])
           for r in all_queries()["fd_violations"].fn(
               spark, str(tmp_path)).collect()}
    assert out["l_partkey->l_suppkey"] == (2, 1, 500000, 2)
    assert out["l_orderkey->l_returnflag"] == (2, 1, 500000, 2)
    assert out["o_custkey->o_orderpriority"] == (2, 1, 500000, 2)
