"""UDF / script / chaining workloads — SURVEY.md §2.10 as checkable queries.

- TRANSFORM ... USING 'script' (ScriptOperator.java:39 / Hadoop Streaming
  PipeMapper.java:35): wordcount whose tokenizer is an external shell script
  over rdd.pipe — must match plain wordcount's oracle exactly.
- CREATE TEMPORARY FUNCTION (FunctionSemanticAnalyzer / spark.udf.register):
  a vectorized pandas UDF called from SQL text.
- ChainMapper/ChainReducer (ChainMapper.java:90): transform composition.
- Counters (Counters.java:51): df.observe metrics attached to a checked plan.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from quatrain_mapreduce_spark.catalog import load_table, register_views
from quatrain_mapreduce_spark.operators.scripting import (
    chain, observed, register_udf, script_transform, stage_script,
)
from quatrain_mapreduce_spark.registry import register

_WORDCOUNT_ORACLE = """
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
"""


@register(
    "transform_pipe_wordcount",
    oracle=_WORDCOUNT_ORACLE,
    doc="TRANSFORM (text) USING 'tokenize.sh': tokenization happens in an "
        "external process over rdd.pipe (PipeMapper line protocol); Spark "
        "aggregates the piped tokens. Matches plain wordcount's oracle — "
        "proving the script path computes the same relation.",
    tags=("udf", "script", "no-sql-plan"),
)
def transform_pipe_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    script = stage_script(
        "qms_tokenize.sh",
        "#!/bin/sh\n# split whitespace-separated tokens onto their own lines\ntr -s ' ' '\\n'\n",
    )
    docs = load_table(spark, sf_dir, "documents")
    tokens = script_transform(docs, script, ["text"])
    return (
        tokens.where(F.col("line") != "")
        .groupBy(F.col("line").alias("word"))
        .agg(F.count("*").alias("cnt"))
    )


_PIPES_WC_C = r"""
#include <stdio.h>
#include <string.h>
/* Hadoop Pipes WordCount map task: read records, emit (word, 1) pairs.
   Line-oriented stdin/stdout instead of the Pipes socket protocol. */
int main(void) {
    static char buf[1 << 20];
    while (fgets(buf, sizeof buf, stdin)) {
        size_t n = strlen(buf);
        if (n && buf[n - 1] == '\n') buf[n - 1] = 0;
        char *save = NULL;
        for (char *tok = strtok_r(buf, " ", &save); tok;
             tok = strtok_r(NULL, " ", &save))
            if (*tok) printf("%s\t1\n", tok);
    }
    return 0;
}
"""


@register(
    "pipes_wordcount",
    oracle=_WORDCOUNT_ORACLE,
    doc="Hadoop Pipes parity (src/c++/pipes/api/hadoop/Pipes.hh, "
        "examples/pipes/impl/wordcount-simple.cc): the map phase runs in a "
        "COMPILED NATIVE C binary (gcc-built at stage time, idempotent) "
        "emitting (word, 1) records over the line pipe; Spark shuffles and "
        "sums the native map output. Same oracle as wordcount — the native "
        "path computes the same relation as the declarative one.",
    tags=("udf", "script", "native", "no-sql-plan"),
)
def pipes_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quatrain_mapreduce_spark.operators.scripting import stage_native_binary

    binary = stage_native_binary("qms_pipes_wc", _PIPES_WC_C)
    docs = load_table(spark, sf_dir, "documents")
    kv = script_transform(docs, binary, ["text"])
    return (
        kv.select(
            F.expr("split_part(line, '\t', 1)").alias("word"),
            F.expr("CAST(split_part(line, '\t', 2) AS BIGINT)").alias("one"),
        )
        .groupBy("word").agg(F.sum("one").alias("cnt"))
    )


@register(
    "udf_registered_sql",
    oracle="""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS n_tokens
        FROM documents
    """,
    doc="CREATE TEMPORARY FUNCTION parity: a vectorized pandas UDF registered "
        "via spark.udf.register and invoked from SQL text over a view "
        "(UDF.java:36 / FunctionRegistry.java:148 resolution).",
    tags=("udf", "sql"),
)
def udf_registered_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(IntegerType())
    def qms_ntokens(text: pd.Series) -> pd.Series:
        return text.fillna("").map(lambda t: sum(1 for x in t.split(" ") if x)).astype("int32")

    register_udf(spark, "qms_ntokens", qms_ntokens)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql("SELECT doc_id, qms_ntokens(text) AS n_tokens FROM documents")


@register(
    "chain_map_wordcount",
    oracle="""
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        WHERE word <> '' AND len(word) >= 4
        GROUP BY word
    """,
    doc="ChainMapper/ChainReducer ([MAP+ / REDUCE MAP*] — ChainMapper.java:90): "
        "lowercase → tokenize+count → length-filter as an explicit transform "
        "chain; Catalyst fuses the links into one stage.",
    tags=("udf", "chain"),
)
def chain_map_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chain(
        docs,
        lambda df: df.select(F.lower(F.col("text")).alias("text")),
        lambda df: df.select(F.explode(F.filter(F.split("text", " "), lambda x: x != F.lit(""))).alias("word")),
        lambda df: df.where(F.length("word") >= 4),
        lambda df: df.groupBy("word").agg(F.count("*").alias("cnt")),
    )


@register(
    "counters_observe",
    oracle="""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem WHERE l_discount > 0.02
        GROUP BY l_returnflag
    """,
    doc="Counters (Counters.java:51) → df.observe: named metrics (rows "
        "scanned, rows kept) computed during the action with exactly-once "
        "semantics — better than accumulator retry double-counting. The "
        "observed plan's result is oracle-checked; counter values asserted "
        "in tests/test_udf_surface.py.",
    tags=("udf", "counters"),
)
def counters_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.where(F.col("l_discount") > 0.02)
    out = filtered.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )
    observed_df, _obs = observed(out, "counters_observe_metrics", F.count(F.lit(1)).alias("groups_out"))
    return observed_df


@register(
    "pandas_udaf_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS wsum,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                   * CAST(l_quantity AS BIGINT))
                 / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 AS wavg_cents
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="User-defined AGGREGATE via Arrow (pandas_udf GROUPED_AGG — the "
        "modern Hive GenericUDAF surface, the one §2.10 registration path "
        "the other UDF queries don't cover): quantity-weighted mean price "
        "per return flag, computed inside a grouped-agg pandas UDF and "
        "checked against the plain-SQL formulation. All accumulation is "
        "int64 (price pre-scaled to cents at the scan, weights integral), "
        "so the UDAF's partial sums are exact and the single final "
        "division is bit-identical across engines — float-accumulation "
        "order can't shift the hash. Plan shows ArrowWindow-free "
        "AggregateInPandas (Arrow-batched, never BatchEvalPython); wsum/"
        "qty ride the SAME UDAF call as struct-free twin aggregates so "
        "the oracle pins the internals, not just the ratio.",
    tags=("udf", "pandas", "aggregate"),
)
def pandas_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
         .cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )

    @pandas_udf("bigint")
    def wsum_udaf(cents: pd.Series, qty: pd.Series) -> int:
        return int((cents * qty).sum())

    @pandas_udf("bigint")
    def qsum_udaf(qty: pd.Series) -> int:
        return int(qty.sum())

    return li.groupBy("l_returnflag").agg(
        wsum_udaf("cents", "qty").alias("wsum"),
        qsum_udaf("qty").alias("qty"),
    ).select(
        "l_returnflag", "wsum", "qty",
        (F.col("wsum") / F.col("qty").cast("double")).alias("wavg_cents"),
    )
