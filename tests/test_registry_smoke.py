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


def test_every_oracle_query_aliases_all_columns():
    """The driver compares columns by name — every oracle must SELECT the
    same aliases the Spark side emits (registry discipline)."""
    for name, q in QUERIES.items():
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper(), name


def test_no_duplicate_registrations():
    assert len(QUERIES) == len(set(QUERIES))
