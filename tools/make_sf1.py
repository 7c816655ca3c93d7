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
  vectors would turn ANN buckets into 10x pileups);
- customer names are regenerated from the offset custkey (verbatim-copied
  names put every record-linkage blocking bucket at copies x its base size
  — the max_bucket cap then drops nearly all of them at sf10 and the
  measured slope collapses to a fixture artifact; see copy_of).

- scaled copies DROP the h16(doc_id)%10==5 hash slice of documents (the
  engine's "new eval release" selector), so the incremental-
  decontamination increment stays release-sized (copy-0's) at every SF
  while everything else grows — see the in-code comment for the trade.

Usage: python tools/make_sf1.py [--out /tmp/qms_sf1] [--copies 10]
                                [--tables documents,embeddings]
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
    if table == "customer" and i > 0:
        # regenerate c_name from the OFFSET custkey (same props.k /
        # doc-suffix precedent): copies with names copied verbatim put
        # every (nation, band, band-value) blocking bucket of the
        # record-linkage tier at copies x its base size, so at sf10 nearly
        # all buckets blow the max_bucket=64 cap and get dropped —
        # candidate work collapses and the measured slope (0.6x/decade,
        # SCALING.md r11) is a fixture artifact, not engine behavior. A
        # genuinely bigger TPC-H names customers sequentially over the
        # bigger key range; mirroring that preserves the name STRUCTURE
        # (zero-padded 9-digit suffix, pigeonhole banding, within-copy
        # edit-distance geometry) while the bucket population grows the
        # way real data's would.
        out = out.withColumn(
            "c_name",
            F.concat(F.lit("Customer#"),
                     F.lpad(F.col("c_custkey").cast("string"), 9, "0")),
        )
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
        # RELEASE-SIZED EVAL INCREMENT (r11, VERDICT r10 #3): the engine's
        # incremental-decontamination queries treat h16(doc_id)%10==5 as the
        # "new eval release". A real release is a FIXED-size artifact, but
        # suffixed copies would land ~10% of EVERY copy in that slice, so at
        # sf10 the increment's gram vocabulary was corpus-sized — an
        # unrepresentative wall (SCALING.md round-10). Dropping the
        # increment-slice rows from scaled copies keeps the increment
        # exactly the base corpus's (copy-0's) — fixed at every SF — while
        # the eval base, train corpus, and posting index keep growing
        # linearly. Trade: scaled copies carry ~90% of base rows (uniform,
        # documented); within-copy near-dup structure is untouched because
        # the drop is a hash slice, not a content filter.
        from quatrain_mapreduce_spark.operators.curation import portable_h16_sql

        out = out.where(F.expr(f"({portable_h16_sql('doc_id')}) % 10 <> 5"))
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
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset to stage (default: all). "
                         "Lets a probe rebuild one table (e.g. documents "
                         "after a fixture-scheme change) or stage a "
                         "documents-only sf100 without paying for lineitem.")
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None

    from quatrain_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="qms-make-sf1")
    os.makedirs(args.out, exist_ok=True)
    sp = spans(spark)
    for table in UNCHANGED:
        if only is not None and table not in only:
            continue
        dst = f"{args.out}/{table}.parquet"
        if not os.path.exists(dst):
            spark.read.parquet(f"{SRC}/{table}.parquet").write.mode("overwrite").parquet(dst)
        print(f"{table}: copied unchanged")
    for table in KEYED:
        if only is not None and table not in only:
            continue
        dst = f"{args.out}/{table}.parquet"
        if os.path.exists(dst):
            print(f"{table}: exists, skipping")
            continue
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        # write in bounded union chunks: a single 1000-leg union (sf100
        # staging) stalls the analyzer/optimizer on plan size; 25-leg
        # chunks keep planning O(seconds) and append incrementally
        chunk_size = 25
        for lo in range(0, args.copies, chunk_size):
            hi = min(lo + chunk_size, args.copies)
            chunk = copy_of(base, table, lo, sp)
            for i in range(lo + 1, hi):
                chunk = chunk.unionByName(copy_of(base, table, i, sp))
            mode = "overwrite" if lo == 0 else "append"
            chunk.repartition(8 if args.copies > 100 else 32) \
                .write.mode(mode).parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"{table}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
