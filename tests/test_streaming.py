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
