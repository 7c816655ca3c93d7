"""SQL entry path — the reference's biggest surface is Hive SQL text
(ql/Driver.java:104, grammar ql/parse/Hive.g). These queries go through
``spark.sql(...)`` over catalog.register_views, pinning dialect semantics the
DataFrame-API queries can't exercise: SQL text parsing, view resolution,
DDL, and partitioned-table pruning.

Shapes mirror the reference's golden corpus
(ql/src/test/queries/clientpositive/{groupby2,join2,union}.q) re-cut onto
the driver's tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quatrain_mapreduce_spark.catalog import load_table, register_views
from quatrain_mapreduce_spark.registry import register


@register(
    "sql_groupby2",
    oracle="""
        SELECT substr(o_orderpriority, 1, 1) AS pri,
               count(DISTINCT o_custkey) AS uniq_cust,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY substr(o_orderpriority, 1, 1)
    """,
    doc="groupby2.q through the SQL text path: spark.sql over registered "
        "views (count DISTINCT + agg on a computed group key).",
    tags=("sql", "hive"),
)
def sql_groupby2(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT substr(o_orderpriority, 1, 1) AS pri,
               count(DISTINCT o_custkey) AS uniq_cust,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY substr(o_orderpriority, 1, 1)
    """)


@register(
    "sql_join2",
    oracle="""
        SELECT c.c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS cnt
        FROM nation n1
        JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
        JOIN customer c ON n1.n_nationkey + n2.n_nationkey = c.c_nationkey
        GROUP BY c.c_mktsegment
    """,
    doc="join2.q parity: chained join where the second join key is an "
        "EXPRESSION over both prior sides (src1.key + src2.key = src3.key — "
        "ql/src/test/queries/clientpositive/join2.q), via SQL text.",
    tags=("sql", "join"),
)
def sql_join2(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql("""
        SELECT c.c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS cnt
        FROM nation n1
        JOIN nation n2 ON n1.n_regionkey = n2.n_regionkey
        JOIN customer c ON n1.n_nationkey + n2.n_nationkey = c.c_nationkey
        GROUP BY c.c_mktsegment
    """)


@register(
    "sql_union",
    oracle="""
        SELECT src, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(key) AS BIGINT) AS sum_key
        FROM (SELECT 'o' AS src, o_orderkey AS key FROM orders
              UNION ALL
              SELECT 'l' AS src, l_orderkey AS key FROM lineitem) u
        GROUP BY src
    """,
    doc="union.q parity: FROM (a UNION ALL b) alias subquery form "
        "(genUnionPlan — SemanticAnalyzer.java:2090), via SQL text.",
    tags=("sql", "setop"),
)
def sql_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql("""
        SELECT src, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(key) AS BIGINT) AS sum_key
        FROM (SELECT 'o' AS src, o_orderkey AS key FROM orders
              UNION ALL
              SELECT 'l' AS src, l_orderkey AS key FROM lineitem) u
        GROUP BY src
    """)


@register(
    "sql_ddl_roundtrip",
    oracle="""
        SELECT n_regionkey, CAST(count(*) AS BIGINT) AS cnt
        FROM nation GROUP BY n_regionkey
    """,
    doc="DDL surface (ql/exec/DDLTask.java, DDLSemanticAnalyzer): CREATE "
        "TABLE AS / SHOW TABLES / DESCRIBE / ALTER (ADD COLUMNS, "
        "TBLPROPERTIES) / DROP through spark.sql against the session "
        "catalog; the query reads back the created table.",
    tags=("sql", "ddl"),
)
def sql_ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from urllib.parse import urlparse

    register_views(spark, sf_dir, ("nation",))
    spark.sql("DROP TABLE IF EXISTS qms_nation_ddl")
    # DROP removes the catalog entry but a stale location from a previous
    # session blocks CREATE (LOCATION_ALREADY_EXISTS) — clear it too
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, "qms_nation_ddl"), ignore_errors=True)
    spark.sql("CREATE TABLE qms_nation_ddl USING parquet AS SELECT * FROM nation")
    # exercise the inspection + mutation DDL (results intentionally unused —
    # parity with SHOW TABLES / DESCRIBE / ALTER in DDLTask)
    spark.sql("SHOW TABLES").collect()
    spark.sql("DESCRIBE TABLE qms_nation_ddl").collect()
    spark.sql("ALTER TABLE qms_nation_ddl ADD COLUMNS (extra_note STRING)")
    spark.sql("ALTER TABLE qms_nation_ddl SET TBLPROPERTIES ('engine'='qms')")
    return spark.sql("""
        SELECT n_regionkey, CAST(count(*) AS BIGINT) AS cnt
        FROM qms_nation_ddl GROUP BY n_regionkey
    """)


def _stage_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write orders partitioned by o_orderstatus once per sf_dir (idempotent):
    the srcpart ds/hr fixture pattern (QTestUtil.java:211-313)."""
    from quatrain_mapreduce_spark.staging import stage_dir

    d = stage_dir(sf_dir, "part_orders")
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        load_table(spark, sf_dir, "orders").write.mode("overwrite") \
            .partitionBy("o_orderstatus").parquet(d)
        open(marker, "w").close()
    return d


@register(
    "sql_partition_pruning",
    oracle="""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    doc="Partitioned table + partition pruning (ql/parse/PartitionPruner."
        "java:238; srcpart fixture): orders written partitionBy(o_orderstatus), "
        "read back with a partition-column predicate — the scan touches only "
        "the matching directory (PartitionFilters in the physical plan).",
    tags=("sql", "partition"),
)
def sql_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage_partitioned_orders(spark, sf_dir)
    part = spark.read.parquet(d)
    return (
        part.where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@register(
    "sql_insert_overwrite_partition",
    oracle="""
        SELECT o_orderstatus AS status, o_orderpriority AS pri,
               CAST(count(*) AS BIGINT) AS cnt,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY o_orderstatus, o_orderpriority
    """,
    doc="INSERT OVERWRITE TABLE ... PARTITION parity (ql/parse/"
        "SemanticAnalyzer.java:1991-2088 dest-to-partition resolution; "
        "qt srcpart loads): a partitioned catalog table receives (1) a "
        "static-partition OVERWRITE into PARTITION (status='F') — first "
        "seeded with wrong rows, so a pass proves OVERWRITE replaced rather "
        "than appended — and (2) a dynamic-partition OVERWRITE "
        "(PARTITION (status) under partitionOverwriteMode=dynamic) that "
        "writes partition 'O' without touching 'F' (Hive dynamic-partition "
        "insert semantics). Read back with a partition predicate; the scan "
        "prunes to the two directories (PartitionFilters asserted in "
        "tests/test_plans.py).",
    tags=("sql", "ddl", "partition"),
)
def sql_insert_overwrite_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from urllib.parse import urlparse

    register_views(spark, sf_dir, ("orders",))
    t = "qms_orders_iop"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    spark.sql(f"""
        CREATE TABLE {t} (
            o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE
        ) USING parquet PARTITIONED BY (status STRING)
    """)
    # seed partition F with WRONG data (one row): the static overwrite below
    # must fully replace it for the oracle to agree
    spark.sql(f"""
        INSERT OVERWRITE TABLE {t} PARTITION (status='F')
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderstatus = 'F' LIMIT 1
    """)
    spark.sql(f"""
        INSERT OVERWRITE TABLE {t} PARTITION (status='F')
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderstatus = 'F'
    """)
    # dynamic-partition overwrite: only the partitions the SELECT produces
    # ('O') are replaced; 'F' must survive (Hive dynamic-partition semantics,
    # not Spark's default clear-all static mode)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        spark.sql(f"""
            INSERT OVERWRITE TABLE {t} PARTITION (status)
            SELECT o_orderkey, o_orderpriority, o_totalprice, o_orderstatus AS status
            FROM orders WHERE o_orderstatus = 'O'
        """)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return spark.sql(f"""
        SELECT status, o_orderpriority AS pri,
               CAST(count(*) AS BIGINT) AS cnt,
               round(sum(o_totalprice), 2) AS sum_price
        FROM {t} WHERE status IN ('F', 'O')
        GROUP BY status, o_orderpriority
    """)


_GROUPING_SETS_SQL = """
    SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
           CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS pri,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
"""


@register(
    "sql_grouping_sets",
    oracle=_GROUPING_SETS_SQL,
    doc="GROUPING SETS — a documented SUPERSET alongside rollup_agg (the "
        "reference's SemanticAnalyzer admits one GROUP BY list per insert; "
        "grouping sets/cube/rollup don't exist): three grouping sets over "
        "one scan replace three reference jobs; subtotal rows flagged via "
        "GROUPING(), identical SQL text on both engines.",
    tags=("sql", "agg", "superset"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "sql_subq",
    oracle="""
        SELECT unioninput.l_returnflag AS flag,
               CAST(count(*) AS BIGINT) AS cnt,
               round(sum(unioninput.l_extendedprice), 2) AS sum_price
        FROM (SELECT l_returnflag, l_extendedprice
              FROM lineitem WHERE l_quantity < 10) unioninput
        GROUP BY unioninput.l_returnflag
    """,
    doc="subq.q parity (ql/src/test/queries/clientpositive/subq.q): a "
        "filtered FROM-subquery with an alias referenced by the outer "
        "query — the only subquery form the reference grammar admits "
        "(no WHERE-subqueries, ql/parse/Hive.g).",
    tags=("sql", "hive"),
)
def sql_subq(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql("""
        SELECT unioninput.l_returnflag AS flag,
               CAST(count(*) AS BIGINT) AS cnt,
               round(sum(unioninput.l_extendedprice), 2) AS sum_price
        FROM (SELECT l_returnflag, l_extendedprice
              FROM lineitem WHERE l_quantity < 10) unioninput
        GROUP BY unioninput.l_returnflag
    """)


@register(
    "sql_case_sensitivity",
    oracle="""
        SELECT n_name AS nm, n_regionkey AS rk
        FROM nation WHERE n_nationkey < 10
        ORDER BY nm
    """,
    doc="case_sensitivity.q parity (ql/src/test/queries/clientpositive/"
        "case_sensitivity.q): table/column identifiers resolved "
        "case-insensitively — the SQL text uses MiXeD case throughout.",
    tags=("sql", "hive"),
)
def sql_case_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("nation",))
    return spark.sql("""
        SELECT X.N_NAME AS nm, x.n_RegionKey AS rk
        FROM NATION x WHERE X.n_nationkey < 10
        ORDER BY NM
    """)


@register(
    "sql_cast1",
    oracle="""
        SELECT CAST(3 + 2 AS DOUBLE) AS c1,
               3 + CAST(2 AS DOUBLE) AS c2,
               CAST(o_orderkey AS DOUBLE) AS c3,
               CAST(floor(o_totalprice) AS BIGINT) AS c4,
               CAST(CAST(1 AS BOOLEAN) AS INT) AS c5,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS c6
        FROM orders WHERE o_orderkey < 20
    """,
    doc="cast1.q parity (ql/src/test/queries/clientpositive/cast1.q, "
        "UDFTo* — FunctionRegistry.java:111-126): int/double promotion, "
        "double->int via floor (trunc-vs-round differs per engine — pinned), boolean<->int, date->string, all through "
        "SQL text.",
    tags=("sql", "hive", "cast"),
)
def sql_cast1(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT CAST(3 + 2 AS DOUBLE) AS c1,
               3 + CAST(2 AS DOUBLE) AS c2,
               CAST(o_orderkey AS DOUBLE) AS c3,
               CAST(floor(o_totalprice) AS BIGINT) AS c4,
               CAST(CAST(1 AS BOOLEAN) AS INT) AS c5,
               CAST(CAST(o_orderdate AS DATE) AS STRING) AS c6
        FROM orders WHERE o_orderkey < 20
    """)


@register(
    "sql_transform",
    oracle="""
        SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name AS nm
        FROM nation
    """,
    doc="TRANSFORM (cols) USING 'cmd' AS (cols) through native SQL text "
        "(ScriptOperator — ql/exec/ScriptOperator.java:39, "
        "ql/parse/SemanticAnalyzer.java:707-796 genScriptPlan): Spark's "
        "no-serde script transform pipes tab-delimited rows through an "
        "external command per partition. 'cat' = the identity script; the "
        "rdd.pipe variant with a real script is transform_pipe_wordcount.",
    tags=("sql", "udf", "script"),
)
def sql_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("nation",))
    return spark.sql("""
        SELECT TRANSFORM (n_nationkey, n_name)
        USING 'cat' AS (k STRING, nm STRING)
        FROM nation
    """)


@register(
    "sql_lateral_view",
    oracle="""
        WITH t AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        )
        SELECT tok, CAST(count(*) AS BIGINT) AS n
        FROM t WHERE tok <> '' GROUP BY tok
    """,
    doc="LATERAL VIEW explode() — Hive's UDTF-in-SQL surface "
        "(ql/parse/Hive.g lateralView; udtf_explode.q): the row→rows "
        "generator runs inside the SQL text path, not the DataFrame API. "
        "Catalyst plans it as Generate inside the scan stage — zero extra "
        "shuffle before the count agg.",
    tags=("sql", "hive", "udtf"),
)
def sql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("documents",))
    return spark.sql("""
        SELECT tok, CAST(count(*) AS BIGINT) AS n
        FROM documents LATERAL VIEW explode(split(text, ' ')) t AS tok
        WHERE tok <> '' GROUP BY tok
    """)


@register(
    "sql_mapjoin_hint",
    oracle="""
        SELECT n.n_name, CAST(count(*) AS BIGINT) AS cnt,
               round(sum(c.c_acctbal), 2) AS bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    doc="MAPJOIN hint parity (ql/exec/MapJoinOperator.java; the /*+ "
        "MAPJOIN(t) */ comment hint in Hive.g): Spark accepts the SAME "
        "hint name as a broadcast-join alias, turning the reference's "
        "hash-table-in-mapper join into a BroadcastHashJoin "
        "(plan-asserted in tests/test_plans.py). Result-identical to the "
        "unhinted join — the hint is a physical-strategy pin only.",
    tags=("sql", "hive", "join"),
)
def sql_mapjoin_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer", "nation"))
    return spark.sql("""
        SELECT /*+ MAPJOIN(n) */ n.n_name, CAST(count(*) AS BIGINT) AS cnt,
               round(sum(c.c_acctbal), 2) AS bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """)


@register(
    "sql_distribute_sort_by",
    oracle="""
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
    """,
    doc="DISTRIBUTE BY + SORT BY (Hive.g distributeByClause/sortByClause; "
        "the reference's reducer-keyed partial sort, distinct from global "
        "ORDER BY): rows hash to reducers by o_custkey and sort only "
        "WITHIN each reducer — Exchange hashpartitioning + Sort "
        "[global=false], no single-reducer total order (plan-asserted). "
        "The oracle is the bare projection: partial sort permutes, never "
        "changes, the row multiset.",
    tags=("sql", "hive", "sort"),
)
def sql_distribute_sort_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey
    """)


@register(
    "sql_window_over",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(o_totalprice, 2) AS price,
               CAST(rank() OVER (PARTITION BY o_custkey
                                 ORDER BY round(o_totalprice, 2) DESC,
                                          o_orderkey) AS INT) AS rnk,
               round(sum(round(o_totalprice, 2))
                     OVER (PARTITION BY o_custkey), 2) AS cust_total,
               round(round(o_totalprice, 2)
                     / sum(round(o_totalprice, 2))
                       OVER (PARTITION BY o_custkey), 4) AS share
        FROM orders
    """,
    doc="Window functions through the SQL TEXT path (rank, partition sum, "
        "ratio-to-report share) — the dialect twin of the DataFrame-API "
        "window_funcs: Hive 2009 had no OVER clause at all (Hive.g has no "
        "window production; users hand-rolled rank with reduce-side "
        "scripts), so this pins the superset's SQL grammar, not just its "
        "API. One hash exchange on o_custkey serves all three windows; "
        "share is an exact division of the 2dp-rounded operands, rounded "
        "4dp.",
    tags=("sql", "window", "superset"),
)
def sql_window_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT o_custkey, o_orderkey,
               round(o_totalprice, 2) AS price,
               CAST(rank() OVER (PARTITION BY o_custkey
                                 ORDER BY round(o_totalprice, 2) DESC,
                                          o_orderkey) AS INT) AS rnk,
               round(sum(round(o_totalprice, 2))
                     OVER (PARTITION BY o_custkey), 2) AS cust_total,
               round(round(o_totalprice, 2)
                     / sum(round(o_totalprice, 2))
                       OVER (PARTITION BY o_custkey), 4) AS share
        FROM orders
    """)


@register(
    "sql_intersect_except",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    doc="INTERSECT / EXCEPT through the SQL text path — set-operation "
        "breadth beyond the reference's UNION-ALL-only grammar "
        "(Hive.g:unionClause is its ONLY set operator): customers with "
        "both final and open orders, minus any with pending ones. "
        "Catalyst plans both as aggregated semi/anti joins (DISTINCT "
        "set semantics), so the cost is two hash joins on the key — "
        "no sort-based set machinery.",
    tags=("sql", "set", "superset"),
)
def sql_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """)


@register(
    "json_struct_parse",
    oracle="""
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT))
                    AS BIGINT) AS sum_k,
               CAST(count(*) FILTER (
                   WHERE json_extract_string(props, '$.k') IS NULL
               ) AS BIGINT) AS n_unparsed,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    doc="Schema-ful JSON parsing: from_json(props, 'k INT') gives a TYPED "
        "struct column — one parse per row at the scan, then pure "
        "columnar access — vs get_json_object's per-path re-parse "
        "(json_field_extract covers that dialect form; Hive 2009 had "
        "only the UDF-based path access). Malformed/missing keys "
        "surface as NULLs and are COUNTED, not dropped — the corrupt-"
        "record discipline skip_bad_records established, applied to "
        "semi-structured columns.",
    tags=("sql", "json"),
)
def json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k")).alias("sum_k"),
        F.count(F.when(F.col("p.k").isNull(), 1)).alias("n_unparsed"),
        F.count("*").alias("n"),
    )


# --- sql_qcorpus family (VERDICT r6 directive #3): the remaining Hive
# golden-corpus shapes (HIVE/ql/src/test/queries/clientpositive/*.q) replayed
# compactly — several reference shapes per registered query, each shape
# executed in full in BOTH engines and collapsed to count/checksum
# fingerprint rows so one frame attests the whole family. Shapes already
# attested elsewhere are NOT repeated: join2 (sql_join2), groupby1/2
# (sql_groupby2), union (sql_union), join9 + input_part1/2's partition
# pruning (sql_partition_pruning, sql_insert_overwrite_partition), the
# multi-insert of groupby7/8 + input_part2 (multi_insert_shared_scan),
# sample1's whole-table bucket (sample_bucket), input_testxpath* (complex
# types — complex_types), inputddl* (sql_ddl_roundtrip).

_QCORPUS_JOINS = """
    WITH base AS (
        SELECT o_orderkey % 100 AS key, o_orderpriority AS value FROM orders
    ), b20k AS (
        SELECT o_orderkey % 20000 AS key, o_orderpriority AS value FROM orders
    ), a AS (
        SELECT key AS c1, value AS c2 FROM base WHERE key > 10 AND key < 20
    ), b AS (
        SELECT key AS c3, value AS c4 FROM base WHERE key > 15 AND key < 25
    ), c AS (
        SELECT key AS c5, value AS c6 FROM base WHERE key > 20 AND key < 25
    ), j3 AS (
        SELECT s1.key AS c1, s3.value AS c4
        FROM b20k s1 JOIN b20k s2 ON s1.key = s2.key
                     JOIN b20k s3 ON s1.key = s3.key
    ), j4 AS (
        SELECT a.c1, a.c2, b.c3, b.c4 FROM a LEFT OUTER JOIN b ON a.c1 = b.c3
    ), j5 AS (
        SELECT a.c1, a.c2, b.c3, b.c4 FROM a RIGHT OUTER JOIN b ON a.c1 = b.c3
    ), j6 AS (
        SELECT a.c1, a.c2, b.c3, b.c4 FROM a FULL OUTER JOIN b ON a.c1 = b.c3
    ), j7 AS (
        SELECT a.c1, b.c3, c.c5
        FROM a FULL OUTER JOIN b ON a.c1 = b.c3
               LEFT OUTER JOIN c ON a.c1 = c.c5
    ), j8 AS (
        SELECT c1, c3 FROM j4 WHERE c3 IS NULL AND c1 IS NOT NULL
    )
    SELECT 'join3' AS shape, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(c1) AS BIGINT) AS ksum,
           CAST(count(c1) AS BIGINT) AS nl, CAST(count(c4) AS BIGINT) AS nr
    FROM j3
    UNION ALL
    SELECT 'join4', CAST(count(*) AS BIGINT),
           CAST(sum(coalesce(c1, 0) + coalesce(c3, 0)) AS BIGINT),
           CAST(count(c1) AS BIGINT), CAST(count(c3) AS BIGINT) FROM j4
    UNION ALL
    SELECT 'join5', CAST(count(*) AS BIGINT),
           CAST(sum(coalesce(c1, 0) + coalesce(c3, 0)) AS BIGINT),
           CAST(count(c1) AS BIGINT), CAST(count(c3) AS BIGINT) FROM j5
    UNION ALL
    SELECT 'join6', CAST(count(*) AS BIGINT),
           CAST(sum(coalesce(c1, 0) + coalesce(c3, 0)) AS BIGINT),
           CAST(count(c1) AS BIGINT), CAST(count(c3) AS BIGINT) FROM j6
    UNION ALL
    SELECT 'join7', CAST(count(*) AS BIGINT),
           CAST(sum(coalesce(c1, 0) + coalesce(c3, 0) + coalesce(c5, 0))
                AS BIGINT),
           CAST(count(c1) AS BIGINT), CAST(count(c5) AS BIGINT) FROM j7
    UNION ALL
    SELECT 'join8', CAST(count(*) AS BIGINT), CAST(sum(c1) AS BIGINT),
           CAST(count(c1) AS BIGINT), CAST(count(c3) AS BIGINT) FROM j8
"""


@register(
    "sql_qcorpus_joins",
    oracle=_QCORPUS_JOINS,
    doc="clientpositive join3-8.q replay (identical SQL text both engines): "
        "join3's 3-way self equi-join selecting the THIRD alias's value; "
        "join4/5/6's LEFT/RIGHT/FULL OUTER between two range-filtered "
        "subqueries with half-overlapping ranges; join7's FULL OUTER "
        "chained into a LEFT OUTER against a third non-overlapping "
        "subquery (NULL-extension through a second join); join8's "
        "NULL-probe anti pattern (c3 IS NULL AND c1 IS NOT NULL over the "
        "left join). Each shape runs in full and is fingerprinted to "
        "(count, key checksum, per-side non-null counts) — null extension "
        "errors, dropped dup-key fanout, or wrong join sides all shift a "
        "fingerprint. join3 keys are % 20000 so self-join fanout stays "
        "~1x at test SF; the d^3 dup-key blowup is inherent to the "
        "reference shape, not the engine (join2's expression-key variant "
        "is attested in sql_join2). join9's partitioned probe side is "
        "attested by sql_partition_pruning.",
    tags=("sql", "hive", "qcorpus", "join"),
)
def sql_qcorpus_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_QCORPUS_JOINS)


_QCORPUS_GROUPBY = """
    WITH src AS (
        SELECT c_nationkey AS key,
               CAST(substr(c_name, 10) AS INT) AS num,
               substr(c_name, 13, 1) AS d1
        FROM customer
    ), g3 AS (
        SELECT CAST(sum(num) AS BIGINT) AS s, round(avg(num), 4) AS a,
               round(avg(DISTINCT num), 4) AS ad,
               max(num) AS mx, min(num) AS mn
        FROM src
    ), g4 AS (
        SELECT d1 FROM src GROUP BY d1
    ), g5 AS (
        SELECT key, CAST(sum(num) AS BIGINT) AS s FROM src GROUP BY key
    ), g6 AS (
        SELECT DISTINCT d1 FROM src
    ), g8 AS (
        SELECT key, CAST(count(DISTINCT d1) AS BIGINT) AS cd
        FROM src GROUP BY key
    )
    SELECT 'groupby3' AS shape, CAST(1 AS BIGINT) AS n,
           CAST(s + mx + mn AS DOUBLE) AS v1, a + ad AS v2 FROM g3
    UNION ALL
    SELECT 'groupby4', CAST(count(*) AS BIGINT),
           CAST(sum(CAST(d1 AS INT)) AS DOUBLE), 0.0 FROM g4
    UNION ALL
    SELECT 'groupby5', CAST(count(*) AS BIGINT),
           CAST(sum(key * s) AS DOUBLE), round(avg(s), 4) FROM g5
    UNION ALL
    SELECT 'groupby6', CAST(count(*) AS BIGINT),
           CAST(sum(CAST(d1 AS INT)) AS DOUBLE), 0.0 FROM g6
    UNION ALL
    SELECT 'groupby8', CAST(count(*) AS BIGINT),
           CAST(sum(key * cd) AS DOUBLE), 0.0 FROM g8
"""


@register(
    "sql_qcorpus_groupby",
    oracle=_QCORPUS_GROUPBY,
    doc="clientpositive groupby3-8.q replay (identical SQL text both "
        "engines), with customer names as the src.value analog "
        "(substr(c_name, 10) is the numeric tail, exactly groupby3's "
        "substr(src.value, 4)): groupby3's global "
        "sum/avg/avg(DISTINCT)/max/min over a computed column; groupby4's "
        "GROUP BY on a substr expression; groupby5's keyed sum of a "
        "computed column; groupby6's SELECT DISTINCT substr; groupby8's "
        "count(DISTINCT expr) per key. Group results are fingerprinted "
        "with key-weighted checksums (sum(key*s)) so a wrong group "
        "assignment shifts the value even when totals agree. groupby7/8's "
        "double-INSERT form is attested by multi_insert_shared_scan; "
        "groupby1/2 by sql_groupby2; the *_limit variants by "
        "sql_qcorpus_input's LIMIT subquery.",
    tags=("sql", "hive", "qcorpus", "groupby"),
)
def sql_qcorpus_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_QCORPUS_GROUPBY)


def _qcorpus_scalar_sql(rlike: str, re_replace_tail: str, backref: str) -> str:
    """udf1-4.q shapes; parameterized only where the two dialects spell the
    same semantics differently: RLIKE vs regexp_matches, Spark's global
    regexp_replace vs DuckDB's explicit 'g' flag, $1 vs \\1 backrefs."""
    return f"""
    SELECT
      'a'  LIKE '%a%' AS l1, 'b' LIKE '%a%' AS l2, 'ab' LIKE '%a%' AS l3,
      'ab' LIKE '%a_' AS l4,
      '%_' LIKE '!%!_' ESCAPE '!' AS l5, 'ab' LIKE '!%!_' ESCAPE '!' AS l6,
      'ab' LIKE '_a%' AS l7, 'ab' LIKE 'a' AS l8,
      {rlike.format(s="''", p="'.*'")} AS r1,
      {rlike.format(s="'a'", p="'[ab]'")} AS r2,
      {rlike.format(s="''", p="'[ab]'")} AS r3,
      {rlike.format(s="'hadoop'", p="'[a-z]*'")} AS r4,
      {rlike.format(s="'hadoop'", p="'o*'")} AS r5,
      regexp_replace('abc', 'b', 'c'{re_replace_tail}) AS rr1,
      regexp_replace('abc', 'z', 'a'{re_replace_tail}) AS rr2,
      regexp_replace('abbbb', 'bb', 'b'{re_replace_tail}) AS rr3,
      regexp_replace('hadoop', '(.)[a-z]*', '{backref}ive'{re_replace_tail}) AS rr4,
      trim('  abc  ') AS t1, rtrim('  abc  ') AS t2, ltrim('  abc  ') AS t3,
      CAST(round(1.5) AS BIGINT) AS m1, CAST(round(-1.5) AS BIGINT) AS m2,
      CAST(floor(1.5) AS BIGINT) AS m3, CAST(floor(-1.5) AS BIGINT) AS m4,
      CAST(ceil(1.5) AS BIGINT) AS m5, CAST(ceil(-1.5) AS BIGINT) AS m6,
      CAST(ceiling(1.0) AS BIGINT) AS m7,
      +3 AS u1, -3 AS u2, 1 + -2 AS u3, ~1 AS u4,
      ag.agg_c, ag.agg_s, ag.agg_a,
      c_custkey AS key
    FROM customer, (
        SELECT CAST(count(try_cast('' AS INT)) AS BIGINT) AS agg_c,
               CAST(sum(try_cast('' AS INT)) AS BIGINT) AS agg_s,
               avg(try_cast('' AS INT)) AS agg_a
        FROM customer
    ) ag
    WHERE c_custkey = 86
    """


@register(
    "sql_qcorpus_scalar",
    oracle=_qcorpus_scalar_sql(
        rlike="regexp_matches({s}, {p})", re_replace_tail=", 'g'",
        backref="\\1",
    ),
    doc="clientpositive udf1-4.q replay: the LIKE pattern matrix including "
        "explicit-ESCAPE metacharacter literals (udf1 uses backslash "
        "escapes, spelled ESCAPE '!' here because default-escape rules "
        "differ across dialects while the ESCAPE clause is portable), the "
        "RLIKE/regexp family (empty-string and zero-width '*' matches), "
        "regexp_replace incl. non-overlapping global replacement "
        "('abbbb'->'abb', which DuckDB needs the 'g' flag for) and "
        "capture-group backrefs ($1 vs \\\\1), trim/rtrim/ltrim (udf2), "
        "aggregates over all-NULL try_cast('' AS INT) input — count=0, "
        "sum/avg NULL (udf3; Hive-2009 CAST semantics via try_cast since "
        "Spark 4 and DuckDB both make bare CAST('') an error), and udf4's "
        "rounding/unary matrix: round/floor/ceil at +-1.5, unary +/-, "
        "1 + -2, bitwise ~1. All constant-foldable on purpose — the shapes "
        "attest DIALECT semantics; the row context (WHERE c_custkey = 86, "
        "udf1's WHERE src.key = 86) proves they evaluate in a real scan.",
    tags=("sql", "hive", "qcorpus", "functions"),
)
def sql_qcorpus_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_qcorpus_scalar_sql(
        rlike="{s} RLIKE {p}", re_replace_tail="", backref="$1",
    ))


_QCORPUS_SAMPLE = """
    SELECT 'bucket_1_of_2' AS shape, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(l_orderkey) AS BIGINT) AS ksum
    FROM lineitem WHERE l_orderkey % 2 = 0
    UNION ALL
    SELECT 'bucket_1_of_5', CAST(count(*) AS BIGINT),
           CAST(sum(l_orderkey) AS BIGINT)
    FROM lineitem WHERE l_orderkey % 5 = 0
    UNION ALL
    SELECT 'bucket_1_of_4', CAST(count(*) AS BIGINT),
           CAST(sum(l_orderkey) AS BIGINT)
    FROM lineitem WHERE l_orderkey % 4 = 0
    UNION ALL
    SELECT 'bucket_1_of_4_pred', CAST(count(*) AS BIGINT),
           CAST(sum(l_orderkey) AS BIGINT)
    FROM lineitem WHERE l_orderkey % 4 = 0 AND l_quantity > 25
"""


@register(
    "sql_qcorpus_sample",
    oracle=_QCORPUS_SAMPLE,
    doc="clientpositive sample2/4/5/6/7.q replay (identical SQL text both "
        "engines): TABLESAMPLE (BUCKET 1 OUT OF {2,5,4} ON key) as the "
        "deterministic key-hash bucket predicate (key % y = x-1 — the "
        "same modulo semantics sample_bucket/operators.bucket_sample "
        "implement, and what SamplePruner.java:62 prunes to when the "
        "table is bucketed on the sample column), plus sample7's extra "
        "row predicate composed with the bucket filter. Spark's native "
        "TABLESAMPLE(BUCKET x OUT OF y) SQL syntax is rand()-based "
        "(non-deterministic), so the Hive ON-column semantics ride as the "
        "explicit pushed-down predicate — at scale this prunes to 1/y of "
        "buckets on a bucketed table instead of scanning.",
    tags=("sql", "hive", "qcorpus", "sample"),
)
def sql_qcorpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_QCORPUS_SAMPLE)


_QCORPUS_INPUT = """
    WITH g AS (
        SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY o_custkey
    ), sq AS (
        SELECT k, c FROM g WHERE k >= 90
    ), lim AS (
        SELECT o_orderkey, o_custkey
        FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 10) t
    ), nest AS (
        SELECT k2 AS key FROM (
            SELECT o_orderkey % 100 AS k2 FROM orders
            WHERE o_orderkey % 100 < 50
        ) x WHERE k2 > 10
    )
    SELECT 'subq2' AS shape, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k * c) AS BIGINT) AS ksum
    FROM sq
    UNION ALL
    SELECT 'input11_limit', CAST(count(*) AS BIGINT),
           CAST(sum(o_orderkey + o_custkey) AS BIGINT) FROM lim
    UNION ALL
    SELECT 'input4_nested', CAST(count(*) AS BIGINT),
           CAST(sum(key) AS BIGINT) FROM nest
"""


@register(
    "sql_qcorpus_input",
    oracle=_QCORPUS_INPUT,
    doc="clientpositive subq.q/subq2.q + input*-family replay (identical "
        "SQL text both engines): subq2's outer filter over a grouped "
        "subquery (predicate on the GROUP key pushes THROUGH the "
        "aggregate to the scan under Catalyst), input11_limit's "
        "LIMIT-inside-subquery (made deterministic with a total order on "
        "the unique key, per the repo's LIMIT rule), and input4's "
        "two-level nested FROM with filters at both levels (collapsed to "
        "one scan predicate by the optimizer). The plain projection "
        "input1-16 shapes are attested by field_selection/scalar_funcs; "
        "input_part* partition pruning by sql_partition_pruning; "
        "inputddl* by sql_ddl_roundtrip; input_testsequencefile by "
        "seqfile_roundtrip.",
    tags=("sql", "hive", "qcorpus", "subquery"),
)
def sql_qcorpus_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_QCORPUS_INPUT)


_RECURSIVE_SQL = """
    WITH RECURSIVE edges AS (
        SELECT DISTINCT event_type AS src, next_type AS dst FROM (
            SELECT event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ) t WHERE next_type IS NOT NULL
    ), paths (path, last, depth) AS (
        SELECT 'signup', 'signup', 1
        UNION ALL
        SELECT p.path || '>' || e.dst, e.dst, p.depth + 1
        FROM paths p JOIN edges e ON p.last = e.src
        WHERE p.depth < 4
    )
    SELECT path, CAST(depth AS INT) AS depth FROM paths
"""


@register(
    "sql_recursive_cte",
    oracle=_RECURSIVE_SQL,
    doc="WITH RECURSIVE through SQL TEXT — path enumeration over the "
        "event-type transition graph (distinct consecutive-type edges per "
        "user, then every path from 'signup' up to depth 4). Attests a "
        "surface the reference never had and Spark itself only gained in "
        "4.x: the recursive-CTE production, UNION ALL seed/step, and "
        "cycle-safe bounded recursion (the type graph IS cyclic — the "
        "depth guard, not vertex dedup, terminates it, which is exactly "
        "the semantics recursive SQL defines). The ORACLE IS THE SAME "
        "TEXT run by DuckDB — dialect-portable recursion, down to the || "
        "concat operator. Scale: the recursion runs on the TYPE graph "
        "(vocabulary-sized, broadcast-friendly); the one corpus-sized "
        "step is the lead() window deriving edges — a single user-keyed "
        "exchange, the sessionize shape.",
    tags=("sql", "hive", "graph"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql(_RECURSIVE_SQL)


@register(
    "sql_variant_shred",
    oracle="""
        SELECT CAST(props->>'$.k' AS INTEGER) % 10 AS k_mod,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS k_sum
        FROM events
        GROUP BY k_mod
    """,
    doc="VARIANT-type semi-structured shredding — Spark 4's parse_json "
        "-> variant_get path (the open-format answer to classic "
        "string-typed JSON columns, binary-encoded so repeated field "
        "access skips re-parsing), aggregated by a field derived from "
        "inside the document. The DuckDB oracle reads the same documents "
        "through its native JSON path operator — two engines, two "
        "semi-structured stacks, one answer. Complements "
        "json_struct_parse (schema-on-read struct) and "
        "json_field_extract (string get_json_object): this is the typed "
        "LAZY path. Scale: shredding rides the scan (no shuffle before "
        "the 10-group agg); at 100 TB VARIANT's binary encoding is the "
        "difference between parsing JSON once and parsing it per field "
        "access.",
    tags=("sql", "json"),
)
def sql_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("events",))
    return spark.sql("""
        SELECT CAST(parse_json(props):k AS INT) % 10 AS k_mod,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(parse_json(props):k AS INT)) AS BIGINT) AS k_sum
        FROM events
        GROUP BY k_mod
    """)


@register(
    "sql_unpivot_groupall",
    oracle="""
        WITH cents AS (
            SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price,
                   CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc
            FROM lineitem
        ), long AS (
            SELECT measure, val FROM cents
            UNPIVOT (val FOR measure IN (qty, price, disc))
        )
        SELECT measure,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(val) AS BIGINT) AS total,
               CAST(min(val) AS BIGINT) AS lo,
               CAST(max(val) AS BIGINT) AS hi
        FROM long
        GROUP BY ALL
    """,
    doc="UNPIVOT clause + GROUP BY ALL through SQL text — the wide-to-"
        "long relational operator (inverse of pivot_wide; the engine's "
        "profile_orders builds the same shape manually with stack()) and "
        "the modern grouping shorthand, both now first-class in Spark 4 "
        "AND DuckDB, so the oracle exercises the IDENTICAL clause "
        "text. Values are exact integer cents. Scale: UNPIVOT is a "
        "scan-local 3x row expansion (no shuffle, no join); the agg is "
        "one map-combinable 3-group pass.",
    tags=("sql", "analytics"),
)
def sql_unpivot_groupall(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql("""
        WITH cents AS (
            SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price,
                   CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc
            FROM lineitem
        ), long AS (
            SELECT measure, val FROM cents
            UNPIVOT (val FOR measure IN (qty, price, disc))
        )
        SELECT measure,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(val) AS BIGINT) AS total,
               CAST(min(val) AS BIGINT) AS lo,
               CAST(max(val) AS BIGINT) AS hi
        FROM long
        GROUP BY ALL
    """)
