"""SparkSession factory tuned for this engine.

Local test mode is ``local[$SPARK_GRAFT_CPUS]`` (default 32). The same
settings are the right defaults on a real cluster: AQE for runtime
re-planning and skew joins, Arrow for every Pandas-UDF exchange, and
shuffle partitions sized to the parallelism at hand rather than the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "llm_map_reduce_summarizer_spark") -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Python workers must import this package even when the driver runs
    # from another cwd (UDF closures reference module helpers). Local
    # mode: inherit via PYTHONPATH. Real cluster: ship a wheel via
    # --py-files / pip-installed images instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # legacy testdata stored events.ts as TIMESTAMP(NANOS); read as
        # long and normalize in the loader (sources/tables.py handles
        # nanos-long, TIMESTAMP_NTZ, and plain TIMESTAMP generations)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
