"""Physical-plan lint over the WHOLE registry — the automated half of the
per-round "would this survive 100×?" audit.

Two invariants every registered query's executed plan must satisfy:

1. No ``CartesianProduct``. A non-broadcast cartesian pairs every partition
   with every other — quadratic work that no cluster size survives. (A
   ``BroadcastNestedLoopJoin`` is tolerated: it at least asserts one side
   fit in executor memory — every engine use is a 1-row total or a bounded
   query/centroid set.)
2. No ``BatchEvalPython`` — row-at-a-time Python UDF evaluation. Python on
   a hot path must be Arrow-batched (``ArrowEvalPython`` / mapInPandas),
   which is 10-100× faster; ``_ROW_UDF_OK`` whitelists parity queries whose
   POINT is the reference's row-oriented contract.
"""

from __future__ import annotations

from quatrain_mapreduce_spark.registry import all_queries

# Queries whose fn() performs heavy side effects before returning a frame —
# real micro-batch streams or staged-directory writes — so "lint" here would
# re-run them and only ever see the read-side plan anyway (ADVICE r6). Each
# has a dedicated end-to-end test: test_streaming*, test_incremental*.
_SKIP = {
    "stream_tumbling_count", "online_agg_events",
    "stream_cdc_apply", "incremental_rollup_merge", "sessionize_incremental",
    "stream_drift_monitor", "stream_auc_monitor",
    "incremental_join_merge",  # staged-view write on first serve
    "k_core_members",          # driver-paced peel rounds inside fn()
    "lpa_communities",         # driver-paced propagation rounds inside fn()
    "bpe_train_merges", "bpe_encode_corpus",  # driver-paced merge rounds
    # inside fn(); exact parity + loop behavior covered by
    # test_bpe_train_matches_pure_python / test_bpe_apply_roundtrips
}

# Queries allowed to scan >=3 source files in the live plan:
_MULTI_SCAN_OK = {
    # round-trips FOUR differently-codec'd staged files by construction —
    # four scans of four DIFFERENT files, not a re-executed subplan
    "codec_roundtrip",
}

# Queries allowed to show BatchEvalPython, each with the reason the
# row-oriented path is the semantic point, not an accident:
_ROW_UDF_OK = {
    # CREATE TEMPORARY FUNCTION parity: the reference's UDF contract is
    # row-at-a-time by definition (Hive GenericUDF.evaluate(row)); the
    # query demonstrates registration + SQL-text invocation, not throughput
    "udf_registered_sql",
}


def test_no_cartesian_product_and_no_row_python_udfs(spark, sf_dir):
    """One pass over every registered plan: lint the hard bans AND diff each
    query's movement/strategy fingerprint against PLAN_FINGERPRINTS.json, so
    an accidental extra shuffle or a broadcast join degrading to sort-merge
    fails here instead of on a cluster. Deliberate plan changes land with a
    refreshed snapshot: ``python tools/plan_fingerprints.py --refresh``."""
    import json
    import os

    from quatrain_mapreduce_spark.planaudit import live_scan_counts, plan_fingerprint

    snap_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "PLAN_FINGERPRINTS.json")
    with open(snap_path) as fh:
        snapshot = json.load(fh)

    qs = all_queries()
    cartesian, row_udf, errors, drifted, rescanned = [], [], [], [], []
    for name, q in qs.items():
        if name in _SKIP:
            continue
        try:
            # persisted fragments left registered by earlier queries (or
            # earlier tests) would substitute InMemoryTableScan into this
            # plan and make the fingerprint order-dependent — clean catalog
            # per query, mirroring tools/plan_fingerprints.py
            spark.catalog.clearCache()
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            errors.append(f"{name}: {type(e).__name__}: {e}")
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan and name not in _ROW_UDF_OK:
            row_udf.append(name)
        fp = plan_fingerprint(plan)
        if fp != snapshot.get(name):
            drifted.append(f"{name}: snapshot={snapshot.get(name)} current={fp}")
        if name not in _MULTI_SCAN_OK:
            over = {t: c for t, c in live_scan_counts(df).items() if c >= 3}
            if over:
                rescanned.append(f"{name}: {over}")
    assert not errors, errors
    assert not cartesian, f"non-broadcast cartesian products: {cartesian}"
    assert not row_udf, f"row-at-a-time Python UDFs on data paths: {row_udf}"
    assert not drifted, (
        "plan-shape drift vs PLAN_FINGERPRINTS.json (if deliberate, refresh "
        "with `python tools/plan_fingerprints.py --refresh` in the same "
        "commit):\n" + "\n".join(drifted)
    )
    assert not rescanned, (
        "live (uncached) table scanned 3+ times — an unpersisted "
        "multi-consumer subplan re-executes its whole upstream per consumer "
        "(the c4_curation_pipeline 5x-at-sf1 class); persist at the branch "
        "point or whitelist with a reason:\n" + "\n".join(rescanned)
    )
