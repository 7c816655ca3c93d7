"""MapReduce operator-library workloads (SURVEY.md §2.2, §2.4, §2.6, §2.11).

The reference's example jobs (WordCount, Grep, Sort, TopK, WikiStats,
DBCountPageView) and lib operators (FieldSelection, KeyFieldBasedComparator,
secondary sort, aggregate package, ValueHistogram, UniqValueCount) as
single declarative plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quatrain_mapreduce_spark.catalog import load_table
from quatrain_mapreduce_spark.operators.aggregates import (
    top_k, uniq_value_count, value_aggregator, value_histogram,
)
from quatrain_mapreduce_spark.operators.projection import (
    field_selection, inverse_map, regex_extract_count, token_count, tokenize,
)
from quatrain_mapreduce_spark.operators.sort import key_field_sort, secondary_sort_agg
from quatrain_mapreduce_spark.registry import register


@register(
    "wordcount",
    oracle="""
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
    """,
    doc="WordCount (examples/WordCount.java:55): tokenize → per-token count; "
        "map-side combine is Catalyst's partial HashAggregate.",
    tags=("mrlib", "example"),
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(load_table(spark, sf_dir, "documents"), "text")


@register(
    "grep",
    oracle="""
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(regexp_extract_all(text, '\\bs[a-z]+')) AS word FROM documents)
        GROUP BY word
        ORDER BY cnt DESC, word
        LIMIT 20
    """,
    doc="Grep (examples/Grep.java:34): regex-extract → count → sort desc — the "
        "reference's two chained jobs collapse into one Catalyst plan "
        "(inter-job pipelining for free, SURVEY §3.2).",
    tags=("mrlib", "example"),
)
def grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = regex_extract_count(load_table(spark, sf_dir, "documents"), "text", r"\bs[a-z]+")
    return top_k(counts, [F.desc("cnt"), F.asc("word")], 20)


@register(
    "topk_users",
    oracle="""
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
        ORDER BY cnt DESC, user_id
        LIMIT 10
    """,
    doc="TopK (examples/TopK.java:126): bounded-heap per partition + global "
        "merge = TakeOrderedAndProject.",
    tags=("mrlib", "example"),
)
def topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = load_table(spark, sf_dir, "events").groupBy("user_id").agg(F.count("*").alias("cnt"))
    return top_k(counts, [F.desc("cnt"), F.asc("user_id")], 10)


@register(
    "field_selection",
    oracle="""
        SELECT p_partkey,
               string_split(p_name, ' ')[2] AS noun,
               string_split(p_name, ' ')[1] AS adjective
        FROM part
    """,
    doc="FieldSelectionMapReduce (lib/FieldSelectionMapReduce.java:64): "
        "cut-style field projection/reorder on a separator.",
    tags=("mrlib",),
)
def field_selection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    cols = field_selection(p, "p_name", " ", [1, 0], ["noun", "adjective"])
    return p.select(F.col("p_partkey"), *cols)


@register(
    "inverse_map",
    oracle="SELECT n_name AS key, n_nationkey AS value FROM nation",
    doc="InverseMapper (lib/InverseMapper.java:29): (k,v) -> (v,k).",
    tags=("mrlib",),
)
def inverse_map_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return inverse_map(n, "n_nationkey", "n_name")


@register(
    "value_histogram",
    oracle="""
        WITH freq AS (
            SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS freq
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_unique,
               min(freq) AS min_freq,
               max(freq) AS max_freq,
               round(avg(freq), 4) AS avg_freq,
               round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY freq) AS DOUBLE), 4) AS median_freq,
               round(stddev_samp(freq), 4) AS std_freq
        FROM freq GROUP BY event_type
    """,
    doc="ValueHistogram (lib/aggregate/ValueHistogram.java): per-key stats over "
        "value-frequency distribution (count/min/median/max/avg/stddev).",
    tags=("mrlib", "aggregate"),
)
def value_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(load_table(spark, sf_dir, "events"), "event_type", "user_id")


@register(
    "uniq_value_count",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS uniq_cnt, CAST(count(*) AS BIGINT) AS total
        FROM events GROUP BY event_type
    """,
    doc="UniqValueCount (lib/aggregate/UniqValueCount.java): exact distinct "
        "count per key (approx_count_distinct is the 100 TB default, exact opt-in).",
    tags=("mrlib", "aggregate"),
)
def uniq_value_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return uniq_value_count(load_table(spark, sf_dir, "events"), "event_type", "user_id")


@register(
    "aggregate_pkg",
    oracle="""
        SELECT round(sum(l_quantity), 2) AS sum_qty,
               max(l_extendedprice) AS max_price,
               min(l_discount) AS min_disc,
               CAST(count(*) AS BIGINT) AS cnt,
               count(DISTINCT l_partkey) AS uniq_parts,
               count(DISTINCT l_suppkey) AS uniq_supps
        FROM lineitem
    """,
    doc="ValueAggregatorJob (lib/aggregate/ValueAggregatorJob.java): many "
        "aggregates in one pass — one scan, one combined shuffle.",
    tags=("mrlib", "aggregate"),
)
def aggregate_pkg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return value_aggregator(li, [
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_discount").alias("min_disc"),
        F.count("*").alias("cnt"),
        F.countDistinct("l_partkey").alias("uniq_parts"),
        F.countDistinct("l_suppkey").alias("uniq_supps"),
    ])


@register(
    "secondary_sort",
    oracle="""
        SELECT l_orderkey,
               string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS sorted_values
        FROM lineitem GROUP BY l_orderkey
    """,
    doc="Secondary sort (setOutputValueGroupingComparator, JobConf.java): "
        "per key, values in sorted order — sort_array(collect_list), "
        "map-side combinable, no per-group Python.",
    tags=("mrlib", "sort"),
)
def secondary_sort_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return secondary_sort_agg(li, "l_orderkey", F.col("l_linenumber"))


@register(
    "key_field_sort",
    oracle="""
        SELECT event_id, event_type, value
        FROM events
        ORDER BY event_type ASC, value DESC, event_id
        LIMIT 500
    """,
    doc="KeyFieldBasedComparator (lib/KeyFieldBasedComparator.java:46): "
        "sort -k1,1 -k2nr multi-field sort with numeric/reverse flags.",
    tags=("mrlib", "sort"),
)
def key_field_sort_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return key_field_sort(
        ev, [F.asc("event_type"), F.desc("value"), F.asc("event_id")],
        ["event_id", "event_type", "value"],
    ).limit(500)


@register(
    "wikistats_shape",
    oracle="""
        SELECT lang, source,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY 1, 2
    """,
    doc="WikiStats (examples/WikiStats.java:36): per-(language, bucket) hit "
        "aggregation; snapshot pipelining handled by streaming.hop.",
    tags=("mrlib", "example"),
)
def wikistats_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.sum("n_chars").alias("total_chars"),
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "dbcount_shape",
    oracle="""
        SELECT event_type AS url, CAST(count(*) AS BIGINT) AS pageview
        FROM events GROUP BY 1
    """,
    doc="DBCountPageView (examples/DBCountPageView.java:72): pageview count; "
        "JDBC in/out lives in sources.readers.read_jdbc / sinks.write_jdbc.",
    tags=("mrlib", "example"),
)
def dbcount_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("url")).agg(F.count("*").alias("pageview"))


@register(
    "json_field_extract",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    """,
    doc="Semi-structured field access (superset of the reference's thrift "
        "struct field access, ExprNodeFieldEvaluator.java): JSON extraction "
        "pushed through an aggregate.",
    tags=("functions",),
)
def json_field_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("k").agg(F.count("*").alias("cnt"))
    )


@register(
    "salted_agg",
    oracle="""
        SELECT event_type, round(sum(value), 2) AS sum_value, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type
    """,
    doc="Skew-safe 2-stage aggregation (genGroupByPlan2MR — "
        "SemanticAnalyzer.java:1335): stage 1 groups on (key, salt) so a hot "
        "key spreads across reducers, stage 2 merges partials. Result equals "
        "the plain groupBy (the oracle).",
    tags=("mrlib", "aggregate", "skew"),
)
def salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quatrain_mapreduce_spark.operators.aggregates import salted_sum
    ev = load_table(spark, sf_dir, "events")
    out = salted_sum(ev, "event_type", "value", salt_buckets=16)
    return out.select("event_type", F.round("sum_value", 2).alias("sum_value"), "cnt")


@register(
    "pi_estimator",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN x * x + y * y <= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS inside,
               round(4.0 * sum(CASE WHEN x * x + y * y <= 1.0 THEN 1 ELSE 0 END) / count(*), 6) AS pi_est
        FROM (
            SELECT ((xor(s1, s1 // 8192) * 32769 + 1) % 2147483648) / 2147483648.0 AS x,
                   ((xor(s2, s2 // 8192) * 32769 + 1) % 2147483648) / 2147483648.0 AS y
            FROM (SELECT (i * 1103515245 + 12345) % 2147483648 AS s1,
                         (i * 69069 + 362437) % 2147483648 AS s2
                  FROM generate_series(0, 99999) t(i))
        )
    """,
    doc="PiEstimator (EX/PiEstimator.java:52): Monte-Carlo quarter-circle "
        "hit counting. Deterministic LCG streams replace rand() so the "
        "sample sequence is engine-portable (integer arithmetic only) and "
        "the oracle replicates it exactly; map-side combine sums partials.",
    tags=("mrlib", "example"),
)
def pi_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = 100_000
    # two 31-bit LCG streams + xorshift mixing (a bare linear sequence puts
    # points on a coarse lattice and biases the estimate by ~0.06); every
    # intermediate stays under 2^62, ANSI-safe. Mirrors the oracle exactly.
    seeds = spark.range(0, n).select(
        F.pmod(F.col("id") * 1103515245 + 12345, F.lit(2147483648)).alias("s1"),
        F.pmod(F.col("id") * 69069 + 362437, F.lit(2147483648)).alias("s2"),
    )
    def mix(s):
        return F.pmod(s.bitwiseXOR(F.floor(s / 8192).cast("long")) * 32769 + 1, F.lit(2147483648))
    pts = seeds.select(
        (mix(F.col("s1")) / 2147483648.0).alias("x"),
        (mix(F.col("s2")) / 2147483648.0).alias("y"),
    )
    hit = F.when(F.col("x") * F.col("x") + F.col("y") * F.col("y") <= 1.0, 1).otherwise(0)
    return pts.agg(
        F.count("*").alias("n"),
        F.sum(hit).alias("inside"),
        F.round(4.0 * F.sum(hit) / F.count("*"), 6).alias("pi_est"),
    )


@register(
    "index_build",
    oracle="""
        SELECT term,
               CAST(count(*) AS BIGINT) AS df,
               array_to_string(list_sort(list(doc_id)), ',') AS postings
        FROM (SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS term
              FROM documents)
        GROUP BY term
        HAVING count(*) >= 5
    """,
    doc="Inverted-index build (contrib/index IndexUpdateMapper/Reducer — the "
        "reference's doc->posting-shard pipeline, minus the Lucene binary "
        "format): explode distinct terms per doc, group by term into sorted "
        "postings lists + document frequency. One explode + one shuffle, "
        "map-side combinable; at scale the output is written "
        "partitionBy(shard) where shard = hash(term) % n "
        "(DistributionPolicy parity). Postings are emitted as a "
        "comma-joined string (numerically sorted first) so the harness can "
        "canonicalize the column — array cells are unhashable in pandas.",
    tags=("mrlib", "example", "index"),
)
def index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(tokenize("text"))).alias("term"),
    )
    return (
        terms.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda d: d.cast("string")
                ),
            ).alias("postings"),
        )
        .where(F.col("df") >= 5)
        .select("term", "df", "postings")
    )


@register(
    "sketch_bounds",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
               1 AS hll_ok,
               1 AS pq_ok
        FROM events
        GROUP BY event_type
    """,
    doc="Sketch error-bound acceptance: HyperLogLog++ distinct counts "
        "(approx_count_distinct, rsd=2%) and KLL-style quantiles "
        "(percentile_approx, accuracy=10000) checked against their exact "
        "twins INSIDE the query — the oracle pins ok-flags to 1, so a "
        "sketch drifting past its bound turns the driver row red. At "
        "100 TB the sketches are the only affordable path (single-pass, "
        "mergeable partials, map-side combine); exact twins here exist "
        "only to bound them at test scale.",
    tags=("mrlib", "sketch", "approx"),
)
def sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_hll"),
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        (
            (F.abs(F.col("n_hll") - F.col("n_exact")) / F.col("n_exact")) <= 0.05
        ).cast("int").alias("hll_ok"),
        (
            F.abs(F.col("p50_approx") - F.col("p50_exact"))
            <= 0.05 * F.abs(F.col("p50_exact")) + 1e-9
        ).cast("int").alias("pq_ok"),
    )
