"""Stage a synthetic sf1 (10x sf0.1) under /tmp for local scale rehearsal.

The driver testdata tops out at sf0.1; /root/testdata is read-only. This
tool scales sf0.1 up 10x by disjoint-key replication so SCALING.md's slope
table can be extended one more decade:

- fact keys are offset per copy by the base table's key-space size, so
  foreign-key joins stay valid and selectivities are preserved within each
  copy; dimension tables with fixed real-world cardinality (region, nation)
  are copied unchanged;
- document text gets a per-copy word suffix (every word w -> w_<i>), which
  preserves within-copy near-duplicate structure EXACTLY (two docs share a
  suffixed shingle iff they shared the original) while producing zero
  cross-copy shingle overlap — naive replication would multiply every
  exact/near-dup cluster 10x and make dedup look superlinear on data that
  no real corpus resembles;
- embedding element 0 is nudged by copy*0.37 for the same reason (identical
  vectors would turn ANN buckets into 10x pileups).

Usage: python tools/make_sf1.py [--out /tmp/qms_sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# key columns to offset, per table: {column: span_key}; spans are computed
# once from the base tables (max+1 of the owning table's primary key)
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
UNCHANGED = ["region", "nation"]


def spans(spark) -> dict[str, int]:
    def mx(table: str, col: str) -> int:
        return (
            spark.read.parquet(f"{SRC}/{table}.parquet")
            .agg(F.max(col)).first()[0] + 1
        )

    return {
        "custkey": mx("customer", "c_custkey"),
        "orderkey": mx("orders", "o_orderkey"),
        "partkey": mx("part", "p_partkey"),
        "suppkey": mx("supplier", "s_suppkey"),
        "eventid": mx("events", "event_id"),
        "userid": mx("events", "user_id"),
        "docid": mx("documents", "doc_id"),
        "vecid": mx("embeddings", "vec_id"),
    }


def copy_of(df: DataFrame, table: str, i: int, sp: dict[str, int]) -> DataFrame:
    out = df
    for col, span_key in KEYED.get(table, {}).items():
        out = out.withColumn(col, F.col(col) + F.lit(i * sp[span_key]))
    if table == "events" and i > 0:
        # offset the item key inside props too (same disjointness rule as
        # the id columns): props.k feeds the co-purchase item key of the
        # whole graph tier, and WITHOUT the offset every copy shares one
        # item catalog — users-per-item × copies, candidate pairs ×
        # copies², so the graph fixture densifies QUADRATICALLY in sf and
        # any graph algorithm looks superlinear on it. Found at sf10
        # (copies=100): the co-purchase self-join shuffle exceeded 70 GB
        # and filled the disk. With the offset the scaled graph is
        # `copies` disjoint replicas of the sf0.1 graph — work must scale
        # linearly, which is what a slope probe needs to measure.
        #
        # KNOWN TRADE (review finding): the offset changes k's VALUE
        # distribution — copies >= 1 have k in [i*100, i*100+99], so any
        # query thresholding on raw k (nested_struct_pushdown's k >= 90,
        # json_field_extract's per-k groups) sees ~91% selectivity /
        # 100*copies groups on this fixture instead of the base 10% /
        # 100 groups. Within-copy selectivity is preserved; one scalar
        # field cannot be simultaneously value-stable and per-copy
        # disjoint, and the graph tier's disjointness is the property the
        # scale probes cannot do without. SCALING.md's
        # nested_struct_pushdown row carries the re-measured post-fix
        # numbers with this caveat.
        out = out.withColumn(
            "props",
            F.concat(
                F.lit('{"k": '),
                (F.get_json_object("props", "$.k").cast("int")
                 + F.lit(i * 100)).cast("string"),
                F.lit("}"),
            ),
        )
    if table == "documents" and i > 0:
        suffixed = F.array_join(
            F.transform(F.split("text", " "), lambda w: F.concat(w, F.lit(f"_{i}"))), " "
        )
        out = out.withColumn("text", suffixed).withColumn("n_chars", F.length("text"))
    if table == "embeddings" and i > 0:
        nudge = F.lit(float(i) * 0.37)
        out = out.withColumn(
            "embedding",
            F.concat(
                F.array((F.element_at("embedding", 1) + nudge).cast("float")),
                F.slice("embedding", 2, 100000),
            ),
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/qms_sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from quatrain_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="qms-make-sf1")
    os.makedirs(args.out, exist_ok=True)
    sp = spans(spark)
    for table in UNCHANGED:
        dst = f"{args.out}/{table}.parquet"
        if not os.path.exists(dst):
            spark.read.parquet(f"{SRC}/{table}.parquet").write.mode("overwrite").parquet(dst)
        print(f"{table}: copied unchanged")
    for table in KEYED:
        dst = f"{args.out}/{table}.parquet"
        if os.path.exists(dst):
            print(f"{table}: exists, skipping")
            continue
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        full = copy_of(base, table, 0, sp)
        for i in range(1, args.copies):
            full = full.unionByName(copy_of(base, table, i, sp))
        full.repartition(32).write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"{table}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
