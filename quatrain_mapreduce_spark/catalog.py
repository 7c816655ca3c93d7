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

    ``events.ts`` is parquet TIMESTAMP with isAdjustedToUTC=false, which
    Spark 4 reads as TIMESTAMP_NTZ (older data generations used
    TIMESTAMP(NANOS), read as raw bigint under ``nanosAsLong``). Normalize
    every variant to TimestampType (LTZ) carrying the naive value as a UTC
    instant — the same convention DuckDB's ``epoch_us(ts)`` applies — so
    ``unix_micros``/window/event-time ops work identically in any session
    regardless of its time zone.
    """
    if name == "events":
        # Harmless on micros data; keeps legacy nanos generations readable
        # on ANY session, including externally-built harness sessions.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize any physical representation of an event-time column to
    TimestampType (LTZ) carrying the stored naive value as a UTC instant.
    Works on batch and streaming frames (deterministic expressions only).
    """
    ts_type = dict(df.dtypes).get(ts_col)
    if ts_type == "bigint":  # legacy TIMESTAMP(NANOS) generation
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    elif ts_type == "timestamp_ntz":
        # naive → UTC instant, independent of spark.sql.session.timeZone
        # (a bare cast — or to_utc_timestamp — would re-interpret the
        # naive value in session-local time first)
        df = df.withColumn(
            ts_col,
            F.timestamp_micros(
                F.expr(
                    f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
                )
            ),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register every table as a temp view (Hive-metastore parity for SQL)."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
