"""Negative SQL corpus — bad queries must fail CLEANLY, mirroring the
reference's clientnegative test strategy (HIVE/ql/src/test/queries/
clientnegative/ + ql/.../negative/: 32 .q files asserting parse/semantic
errors, run by QTestUtil expecting failure). Each case here pins that the
engine raises a typed, catchable error — never a wrong answer, never a hang.

Categories re-cut from the reference corpus onto the driver's tables:
unresolved identifiers (unknown_column1.q, invalid_t_alter1.q), semantic
analysis (groupby keys, ambiguous refs, union arity — union2.q,
clusterby_distributeby.q family), bad partition specs (dyn_part1.q),
strict-mode cast/overflow (ANSI), script failures (script_broken_pipe1.q),
and malformed input under FAILFAST (the PERMISSIVE happy path is
skip_bad_records).
"""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException
from pyspark.errors.exceptions.base import PySparkException
from pyspark.sql import functions as F

from quatrain_mapreduce_spark.catalog import register_views


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    register_views(spark, "/root/testdata/sf0.001", ("nation", "orders"))


def test_unknown_column_fails_at_analysis(spark):
    with pytest.raises(AnalysisException) as e:
        spark.sql("SELECT n_name, no_such_col FROM nation").collect()
    assert "no_such_col" in str(e.value)


def test_unknown_table_fails_at_analysis(spark):
    with pytest.raises(AnalysisException) as e:
        spark.sql("SELECT * FROM qms_no_such_table_xyz").collect()
    assert "qms_no_such_table_xyz" in str(e.value).lower()


def test_unknown_function_fails_at_analysis(spark):
    with pytest.raises(AnalysisException):
        spark.sql("SELECT qms_no_such_udf(n_name) FROM nation").collect()


def test_non_aggregated_column_outside_group_by(spark):
    """groupby keys semantic check (clientnegative groupby family)."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT n_name, count(*) AS c FROM nation GROUP BY n_regionkey").collect()


def test_ambiguous_column_reference_in_self_join(spark):
    with pytest.raises(AnalysisException):
        spark.sql("""
            SELECT n_nationkey FROM nation a
            JOIN nation b ON a.n_regionkey = b.n_regionkey
        """).collect()


def test_union_arity_mismatch(spark):
    """union2.q negative shape: branches must agree on column count."""
    with pytest.raises(AnalysisException):
        spark.sql("""
            SELECT n_nationkey, n_name FROM nation
            UNION ALL
            SELECT n_nationkey FROM nation
        """).collect()


def test_insert_bad_partition_spec(spark):
    """dyn_part1.q shape: PARTITION clause naming a non-partition column."""
    spark.sql("DROP TABLE IF EXISTS qms_neg_part")
    import os
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, "qms_neg_part"), ignore_errors=True)
    spark.sql("""
        CREATE TABLE qms_neg_part (k BIGINT) USING parquet PARTITIONED BY (ds STRING)
    """)
    try:
        with pytest.raises(AnalysisException):
            spark.sql("""
                INSERT OVERWRITE TABLE qms_neg_part PARTITION (not_a_partition_col='x')
                SELECT n_nationkey FROM nation
            """)
    finally:
        spark.sql("DROP TABLE IF EXISTS qms_neg_part")


def test_insert_into_view_fails(spark):
    """Views are not insert targets (load_wrong_noof_partitions family —
    writing somewhere that can't accept rows must fail at analysis)."""
    with pytest.raises(AnalysisException):
        spark.sql("INSERT INTO nation VALUES (999, 'x', 0, 'c')")


def test_strict_cast_of_malformed_string_fails(spark):
    """ANSI/strict mode: CAST('abc' AS INT) is an error, not NULL (the
    reference's strict-type UDFToInteger path)."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(PySparkException) as e:
            spark.sql("SELECT CAST('abc' AS INT) AS v").collect()
        assert "CAST_INVALID_INPUT" in str(e.value) or "abc" in str(e.value)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_strict_arithmetic_overflow_fails(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(PySparkException) as e:
            spark.sql("SELECT 9223372036854775807 + CAST(1 AS BIGINT) AS v").collect()
        assert "ARITHMETIC_OVERFLOW" in str(e.value) or "overflow" in str(e.value).lower()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_transform_broken_script_fails(spark):
    """script_broken_pipe1.q parity: TRANSFORM through a failing command
    surfaces a job failure, not silent truncation."""
    with pytest.raises(Exception) as e:
        spark.sql("""
            SELECT TRANSFORM (n_nationkey)
            USING 'false' AS (k STRING)
            FROM nation
        """).collect()
    assert "Subprocess exited" in str(e.value) or "exit" in str(e.value).lower()


def test_transform_nonexistent_command_fails(spark):
    with pytest.raises(Exception):
        spark.sql("""
            SELECT TRANSFORM (n_nationkey)
            USING 'qms_no_such_binary_xyz' AS (k STRING)
            FROM nation
        """).collect()


def test_failfast_malformed_csv_fails(spark, tmp_path):
    """FAILFAST is the negative twin of skip_bad_records' PERMISSIVE read:
    a malformed row aborts the job instead of being skipped."""
    p = tmp_path / "bad.csv"
    p.write_text("k,v\n1,a\nnot_a_number,b\n")
    with pytest.raises(Exception) as e:
        spark.read.schema("k bigint, v string").option("header", True) \
            .option("mode", "FAILFAST").csv(str(p)).collect()
    assert "Malformed" in str(e.value) or "FAILFAST" in str(e.value)


def test_streaming_agg_append_without_watermark_fails(spark):
    """Streaming semantic negatives (the CQ layer's analysis errors):
    an aggregate in append mode needs a watermark to ever finalize."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .groupBy("value").count()
    )
    with pytest.raises(Exception) as e:
        q = stream.writeStream.format("memory").queryName("qms_neg_s1") \
            .outputMode("append").start()
        q.stop()
    msg = str(e.value)
    assert "watermark" in msg.lower() or "append" in msg.lower()


def test_streaming_complete_mode_without_aggregation_fails(spark):
    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    with pytest.raises(Exception) as e:
        q = stream.writeStream.format("memory").queryName("qms_neg_s2") \
            .outputMode("complete").start()
        q.stop()
    assert "complete" in str(e.value).lower()


def test_stream_stream_outer_join_without_watermark_fails(spark):
    """Outer stream-stream joins REQUIRE watermarks + a time bound (state
    must be evictable to emit null-padded rows); inner joins don't."""
    left = spark.readStream.format("rate").option("rowsPerSecond", 1).load() \
        .select(F.col("value").alias("lk"), F.col("timestamp").alias("lts"))
    right = spark.readStream.format("rate").option("rowsPerSecond", 1).load() \
        .select(F.col("value").alias("rk"), F.col("timestamp").alias("rts"))
    joined = left.join(right, F.col("lk") == F.col("rk"), "left_outer")
    with pytest.raises(Exception):
        q = joined.writeStream.format("memory").queryName("qms_neg_s3") \
            .outputMode("append").start()
        q.stop()


def test_duplicate_create_table_fails(spark, tmp_path):
    """create_table_failure family: CREATE without IF NOT EXISTS on an
    existing table is an error."""
    spark.sql("DROP TABLE IF EXISTS qms_neg_dup")
    import os
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, "qms_neg_dup"), ignore_errors=True)
    spark.sql("CREATE TABLE qms_neg_dup (k BIGINT) USING parquet")
    try:
        with pytest.raises(AnalysisException):
            spark.sql("CREATE TABLE qms_neg_dup (k BIGINT) USING parquet")
    finally:
        spark.sql("DROP TABLE IF EXISTS qms_neg_dup")


def test_intersect_column_count_mismatch_fails(spark):
    """Set operations require matching column counts — clean analysis error,
    not silent padding (union.q negative family, extended to INTERSECT)."""
    spark.range(3).createOrReplaceTempView("qms_neg_i1")
    spark.range(3).select("id", F.lit(1).alias("x")) \
        .createOrReplaceTempView("qms_neg_i2")
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT id FROM qms_neg_i1 INTERSECT SELECT id, x FROM qms_neg_i2"
        ).collect()


def test_from_json_malformed_schema_fails(spark):
    """from_json with an unparseable schema string is a clean error at
    analysis time, not a runtime surprise."""
    df = spark.createDataFrame([("{}",)], "j string")
    with pytest.raises(Exception):
        df.select(F.from_json("j", "k INT,, broken !!")).collect()


def test_pq_rejects_indivisible_subspaces(spark):
    """PQ requires dim % m == 0 — a clean assertion at build time, not a
    silent ragged-slice quantizer."""
    from quatrain_mapreduce_spark.operators.similarity import pq_train

    df = spark.createDataFrame([(0, [0.0] * 10)], "vec_id long, embedding array<double>")
    with pytest.raises(AssertionError):
        pq_train(df, "vec_id", "embedding", dim=10, m=4)


def test_bpe_apply_empty_merge_table_is_character_split(spark):
    """Zero merges is the identity tokenizer: every word splits to
    characters (the degenerate base case train->apply must agree on)."""
    from quatrain_mapreduce_spark.operators.text import bpe_apply

    df = spark.createDataFrame([(1, "hello ab")], "doc_id long, text string")
    rows = {r["word_pos"]: r["syms"]
            for r in bpe_apply(df, "doc_id", "text", []).collect()}
    assert rows == {0: ["h", "e", "l", "l", "o"], 1: ["a", "b"]}


def test_like_escape_requires_single_char(spark):
    """LIKE ... ESCAPE with a multi-character escape string is a clean
    analysis-time error in the SQL dialect (udf1.q escape family)."""
    with pytest.raises(Exception):
        spark.sql("SELECT 'ab' LIKE 'a%' ESCAPE '!!'").collect()


def test_recursive_cte_without_union_fails(spark):
    """A WITH RECURSIVE whose body never references itself through the
    required UNION [ALL] seed/step shape must fail analysis, not loop."""
    with pytest.raises(PySparkException):
        spark.sql(
            "WITH RECURSIVE t(n) AS (SELECT n + 1 FROM t) "
            "SELECT * FROM t LIMIT 1"
        ).collect()


def test_unpivot_mixed_incompatible_types_fails(spark):
    """UNPIVOT over columns with no common type must raise a typed
    analysis error (the clause requires least-common-type coercion)."""
    spark.sql(
        "SELECT 1 AS a, named_struct('x', 1) AS b"
    ).createOrReplaceTempView("qms_neg_upt")
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT m, v FROM qms_neg_upt UNPIVOT (v FOR m IN (a, b))"
        ).collect()


def test_variant_get_on_malformed_json_fails(spark):
    """parse_json must reject malformed documents with a typed error
    (try_parse_json is the PERMISSIVE twin that yields NULL instead)."""
    with pytest.raises(Exception, match="MALFORMED_RECORD_IN_PARSING"):
        spark.sql("SELECT parse_json('{not json')").collect()
    # and the permissive twin really is permissive
    assert spark.sql(
        "SELECT try_parse_json('{not json') IS NULL AS ok"
    ).collect()[0]["ok"]
