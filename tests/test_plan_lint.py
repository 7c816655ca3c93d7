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
# Single shared copy (tools/plan_fingerprints.py imports the same set).
from quatrain_mapreduce_spark.planaudit import PLAN_BUILD_SKIP as _SKIP

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

    from quatrain_mapreduce_spark.planaudit import fingerprint_query

    snap_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "PLAN_FINGERPRINTS.json")
    with open(snap_path) as fh:
        snapshot = json.load(fh)

    qs = all_queries()
    # a DEREGISTERED query must not leave a stale snapshot entry behind —
    # the drift loop below only walks live queries, so without this check a
    # removed query's fingerprint would linger unnoticed (ADVICE r9)
    stale = set(snapshot) - set(qs) - set(_SKIP)
    assert not stale, f"PLAN_FINGERPRINTS.json entries for deregistered queries: {sorted(stale)}"
    cartesian, row_udf, errors, drifted = [], [], [], []
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
        # fingerprint_query = string features + max_live_rescan (the live
        # per-source scan multiplicity, cache-boundary aware) — an increase
        # in any count, including a NEW live rescan of the same table (the
        # unpersisted-branch-point class that cost c4_curation_pipeline 5x
        # at sf1), fails as drift against the reviewed snapshot
        fp = fingerprint_query(df)
        if fp != snapshot.get(name):
            drifted.append(f"{name}: snapshot={snapshot.get(name)} current={fp}")
    assert not errors, errors
    assert not cartesian, f"non-broadcast cartesian products: {cartesian}"
    assert not row_udf, f"row-at-a-time Python UDFs on data paths: {row_udf}"
    assert not drifted, (
        "plan-shape drift vs PLAN_FINGERPRINTS.json (if deliberate, refresh "
        "with `python tools/plan_fingerprints.py --refresh` in the same "
        "commit):\n" + "\n".join(drifted)
    )
