"""Table catalog over the driver-generated parquet star schema.

The reference has two schema worlds (SURVEY.md §1.3): class-declared K/V jobs
and metastore-backed Hive tables. Here both collapse into DataFrames with
StructType schemas; this module is the metastore stand-in — it knows where
tables live, normalizes physical quirks (nanosecond timestamps), and registers
temp views so the whole Hive-SQL surface is available via ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, normalizing physical storage quirks.

    ``events.ts`` is TIMESTAMP(NANOS) parquet which Spark reads as raw bigint
    under ``nanosAsLong``; convert to TimestampType (microsecond precision —
    integer division, no float rounding) so downstream window/event-time ops
    are idiomatic.
    """
    if name == "events":
        # TIMESTAMP(NANOS) parquet: the conf is runtime-settable, and setting
        # it here (not only in get_spark) makes the read work on ANY session,
        # including externally-built harness sessions.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register every table as a temp view (Hive-metastore parity for SQL)."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
