"""Parquet table loaders for the star schema + events/documents/embeddings.

``spark.read.parquet`` gives Catalyst full pushdown: filters and column
pruning reach the scan (verify with ``df.explain``: ``PushedFilters`` /
``ReadSchema``). At 100 TB the fact tables (lineitem, orders, events,
documents) arrive partitioned; the loaders take any directory layout
parquet supports.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
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
]

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are fixed-size; supplier/part grow slowly with SF).
BROADCAST_DIMS = {"region", "nation", "supplier", "part"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # Older testdata generations stored ts as TIMESTAMP(NANOS), which
        # vanilla Spark rejects (PARQUET_TYPE_ILLEGAL). Surface nanos as
        # long here — at the read site, not in session construction — so
        # the table is loadable under ANY SparkSession (drivers/notebooks
        # build their own). Runtime conf set is idempotent.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a session-tz TimestampType, whatever
    physical type the parquet writer used.

    Seen in the wild across testdata generations:

    * ``TIMESTAMP(NANOS)`` — surfaced as long nanos via
      ``spark.sql.legacy.parquet.nanosAsLong`` (Spark has no nanos type);
      convert with integer div (float division loses precision ~1e18 ns).
    * ``TIMESTAMP(MICROS, isAdjustedToUTC=false)`` — surfaced as
      TIMESTAMP_NTZ by Spark 3.4+; cast to timestamp. The session tz is
      UTC (session.py), so the cast is value-preserving, and downstream
      ``unix_micros``/watermarks (which reject NTZ) resolve.
    * plain ``TIMESTAMP`` — already what we want.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so plans can use spark.sql."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
