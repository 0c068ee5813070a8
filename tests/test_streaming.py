"""Streaming-vs-batch parity (SURVEY.md §5.4): draining the events
parquet through the streaming plans must reproduce the batch results
exactly on static input."""

from __future__ import annotations

from llm_map_reduce_summarizer_spark.plans.events import (
    events_hourly,
    events_sessionize,
)
from llm_map_reduce_summarizer_spark.plans.streams import (
    stream_hourly,
    stream_sessionize,
)
from .oracle_utils import compare_frames

SF = "/root/testdata/sf0.001"


def test_stream_hourly_matches_batch(spark):
    stream = stream_hourly(spark, SF).toPandas()
    batch = events_hourly(spark, SF).toPandas()
    assert len(stream) > 0
    assert compare_frames(stream, batch) == []


def test_stream_sessionize_matches_batch(spark):
    stream = stream_sessionize(spark, SF).toPandas()
    batch = events_sessionize(spark, SF).toPandas()
    assert len(stream) > 0
    assert compare_frames(stream, batch) == []


def test_stream_parquet_file_sink(spark, tmp_path):
    """availableNow drain into a parquet file sink; read-back equals
    the batch aggregation (append mode emits only watermark-closed
    windows, so compare against the batch result minus the last open
    hour)."""
    import os

    from pyspark.sql import functions as F

    from llm_map_reduce_summarizer_spark.streaming.stream_ops import (
        hourly_counts,
        read_events_stream,
    )

    ev = read_events_stream(spark, SF)
    out = os.path.join(str(tmp_path), "hourly_parquet")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = (
        hourly_counts(ev)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    batch = events_hourly(spark, SF)
    # append mode emits a window once the watermark (max event time -
    # 1h) passes its END: hour + 1h <= max_ts - 1h
    from llm_map_reduce_summarizer_spark.sources.tables import load_table

    max_ts = (
        load_table(spark, SF, "events").agg(F.max("ts")).collect()[0][0]
    )
    closed = batch.filter(
        F.col("hour") + F.expr("INTERVAL 2 HOURS") <= F.lit(max_ts)
    )
    assert back.count() == closed.count()
    assert compare_frames(back.toPandas(), closed.toPandas()) == []
