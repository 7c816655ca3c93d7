"""Registry smoke: every registered query executes at sf0.001 and returns a
stable schema — the engine-side half of the driver's correctness gate.
Oracle agreement is checked by tools/check_oracle.py (and the driver at
sf0.01); here we pin that nothing in queries() crashes on a plain session.
"""

from __future__ import annotations

import pytest

from quatrain_mapreduce_spark.registry import all_queries

QUERIES = all_queries()

# slow end-to-end streaming/pipe queries exercised in their dedicated tests
_SKIP = {"stream_tumbling_count", "online_agg_events"}


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in _SKIP))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.columns, f"{name} returned no columns"
    n = df.count()
    assert n >= 0
    # Persisted frames (BFS frontiers, LSH shingle branches, staged views)
    # are dead weight once the query is counted; without this, ~240 smoke
    # runs accumulate cache in the shared session until the heaviest query
    # OOMs the suite JVM (graph_bfs_reach, flaky at ~500-test scale).
    spark.catalog.clearCache()


def test_every_oracle_query_aliases_all_columns():
    """The driver compares columns by name — every oracle must SELECT the
    same aliases the Spark side emits (registry discipline)."""
    for name, q in QUERIES.items():
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper(), name


def test_no_duplicate_registrations():
    assert len(QUERIES) == len(set(QUERIES))


def test_driver_window_covers_every_plan_module():
    """The driver's correctness gate checks only the first 50 queries in
    ``queries()`` order; assert that window samples all seven plan modules
    (r03 finding: SQL/streaming/UDF/source queries fell outside it)."""
    window = list(QUERIES.values())[:50]
    modules = {q.fn.__module__.rsplit(".", 1)[-1] for q in window}
    assert modules >= {
        "relational", "mrlib", "data_pipeline", "streaming_queries",
        "hive_sql", "udf_surface", "sources_queries",
    }, modules


def test_driver_window_mostly_oracled():
    """Gate-window slots are precious — rows-only queries (no oracle) belong
    in the tail unless the window has spare room."""
    window = list(QUERIES.values())[:50]
    rows_only = [q.name for q in window if q.oracle is None]
    assert len(rows_only) <= 3, rows_only
