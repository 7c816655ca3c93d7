"""Dump .explain('formatted') for bench queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]  (round dir from $SPARK_GRAFT_PLANS_ROUND, default r14)
  tag    'before' or 'after' (file suffix)
  query  optional subset; default = every BENCH_QUERIES row

Also prints a one-line plan-shape summary per query (Exchange count, join
node kinds, python-eval node count, scans) so a diff of shapes is readable
without opening the files.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from quatrain_mapreduce_spark.registry import all_queries  # noqa: E402
from quatrain_mapreduce_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def shape(txt: str) -> str:
    def n(pat: str) -> int:
        return len(re.findall(pat, txt))

    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                       r"BroadcastNestedLoopJoin|CartesianProduct)", txt)
    return (f"exch={n(r'Exchange')} scans={n(r'Scan ')} "
            f"py={n(r'(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)')} "
            f"joins={'+'.join(joins) if joins else '-'} "
            f"aqe={n(r'AdaptiveSparkPlan')}")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="qms-dump-plans")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        try:
            df = qs[name].fn(spark, sf_dir)
            txt = plan_text(df)
        except Exception as exc:
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{name}: {shape(txt)}")


if __name__ == "__main__":
    main()
