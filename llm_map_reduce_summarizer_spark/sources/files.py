"""Generic file sources and sinks (SURVEY.md §2.8).

Readers take an explicit schema wherever the format can't carry one —
schema inference is a full extra scan of the data, unacceptable at
100 TB. Sinks default to snappy parquet, optionally partitioned and
bucket-sorted so downstream joins/windows on the partition key read
co-located, pre-clustered data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # inference scans the data twice — fine for ad-hoc use, never
        # in a production path
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """JSON-lines (one object per line — splittable, unlike multiLine)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink; ``partition_by`` lays out hive-style directories so
    readers get partition pruning on those keys for free."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC source (native Spark format, columnar + predicate pushdown
    like parquet; common in Hive-era lakes)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text_files(spark: SparkSession, path: str) -> DataFrame:
    """One row per LINE (`value` column) — raw-corpus text ingestion;
    splittable, so a single huge file still parallelizes."""
    return spark.read.text(path)


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per FILE with (path, modificationTime, length, content)
    — the ingestion path for image/audio blobs feeding the multimodal
    operators. Whole files don't split; parallelism comes from file
    count, so shard huge blob collections into many objects upstream.
    """
    return spark.read.format("binaryFile").load(path_glob)
