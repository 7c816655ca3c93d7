"""Staged-query gate: every entry in plans/staged.py must already pass the
same Spark-vs-DuckDB compare the driver applies to registered queries, so
promotion next round (move to a plan module + a driver-window slot) is a
mechanical diff, not new risk.

Compare mirrors tools/check_oracle.py: row count, column-name set, and
values with columns sorted by name and rows sorted — exact (every staged
query emits only ints/strings/md5 hex, no floats, by design)."""

from __future__ import annotations

import duckdb
import pytest

from quatrain_mapreduce_spark.catalog import TABLES
from quatrain_mapreduce_spark.plans.staged import STAGED
from tests.conftest import SF_DIR, SF_DIR_MID


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(r[i] for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.mark.parametrize("name", sorted(STAGED))
@pytest.mark.parametrize("sf_dir_case", [SF_DIR, SF_DIR_MID])
def test_staged_query_matches_oracle(spark, name, sf_dir_case):
    q = STAGED[name]
    sdf = q.fn(spark, sf_dir_case)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir_case}/{t}.parquet')"
        )
    res = con.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: schema {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    assert len(srows) > 0, f"{name}: empty result"
    assert _normalize(srows, scols) == _normalize(drows, dcols), name


def test_staged_plans_pass_lint(spark):
    """Staged plans obey the same hard bans as registered ones."""
    for name, q in STAGED.items():
        plan = q.fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_staged_names_not_registered():
    """The freeze: staged queries must NOT leak into the live registry."""
    from quatrain_mapreduce_spark.registry import all_queries

    live = set(all_queries())
    assert not (set(STAGED) & live)
