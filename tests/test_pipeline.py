"""End-to-end pipeline on the reference's own input format
(transcript-example.json) — mirrors the reference's integration tests
(test_aggregator.py / test_direct_aggregation.py): structure of the
final output, batching decisions, and budget discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_map_reduce_summarizer_spark.operators.aggregator import (
    hierarchical_reduce,
)
from llm_map_reduce_summarizer_spark.operators.chunker import (
    assign_chunks,
    chunk_stats,
)
from llm_map_reduce_summarizer_spark.operators.executor import summarize_chunks
from llm_map_reduce_summarizer_spark.operators.preprocess import (
    merge_same_speaker,
    preprocess_segments,
)
from llm_map_reduce_summarizer_spark.sources.transcript import read_transcript

EXAMPLE = "/root/reference/transcript-example.json"


def test_transcript_reader_schema(spark):
    seg = read_transcript(spark, EXAMPLE)
    assert [f.name for f in seg.schema.fields] == [
        "doc_id", "seg_id", "start", "end", "speaker", "text",
    ]
    n = seg.count()
    assert n > 1000  # the example transcript is a long stream VOD
    # segments are time-ordered per document with start <= end
    bad = seg.filter(F.col("end") < F.col("start")).count()
    assert bad == 0


def test_full_pipeline_on_reference_transcript(spark):
    seg = read_transcript(spark, EXAMPLE).drop("doc_id")
    cleaned = preprocess_segments(seg)
    merged = merge_same_speaker(cleaned, max_duration=120.0).select(
        F.col("group_id").alias("seg_id"), "start", "end", "speaker", "text"
    )
    assert merged.count() < cleaned.count()  # merge actually combines

    chunked = assign_chunks(merged, max_tokens_per_chunk=500)
    stats = chunk_stats(chunked)
    sp = stats.toPandas()
    # budget discipline: token_count <= budget + max single segment
    mx = chunked.agg(F.max("n_tokens")).collect()[0][0]
    assert (sp["token_count"] <= 500 + mx).all()
    # position pct is chunk-relative (reference big_chunkeroosky
    # formula): bounded, zero for the opening chunk
    sp = sp.sort_values("chunk_id")
    assert sp["position_pct"].iloc[0] == 0.0
    assert ((sp["position_pct"] >= 0) & (sp["position_pct"] <= 100)).all()

    texts = chunked.groupBy("chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("seg_id").alias("o"),
                            F.col("seg_text").alias("t"),
                        )
                    )
                ),
                lambda x: x["t"],
            ),
            "\n\n",
        ).alias("text"),
        F.sum("n_tokens").alias("token_count"),
    )
    summaries = summarize_chunks(texts)
    final = hierarchical_reduce(summaries, batch_size=10).toPandas()
    assert len(final) == 1
    assert final["summary"][0].startswith("# Transcript Summary")
    # every chunk's summary made it into the tree (no drops)
    n_chunks = texts.count()
    assert final["summary"][0].count("SUMMARY[") == n_chunks
