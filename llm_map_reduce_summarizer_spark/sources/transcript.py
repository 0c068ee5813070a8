"""Transcript JSON source — the reference engine's native input format.

The reference (main.py: ``load_transcript`` path; see
transcript-example.json) consumes one JSON object per file:

    {"segments": [{"start": 0.0, "end": 25.5,
                   "text": "...", "speaker": "SPEAKER_00"}, ...]}

Here each file becomes one document; ``posexplode(segments)`` yields
the segment DataFrame every pipeline operator consumes:
``(doc_id string, seg_id long, start double, end double,
speaker string, text string)``.

Scale: ``spark.read.json`` with an explicit schema (no inference scan)
and one file per transcript parallelizes across files; the explode is
narrow (no shuffle). A 100 TB corpus of transcripts partitions by
file naturally and downstream operators partition windows on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SEGMENT_SCHEMA = StructType(
    [
        StructField("start", DoubleType()),
        StructField("end", DoubleType()),
        StructField("text", StringType()),
        StructField("speaker", StringType()),
    ]
)

TRANSCRIPT_SCHEMA = StructType(
    [StructField("segments", ArrayType(SEGMENT_SCHEMA))]
)


def read_transcript(spark: SparkSession, path: str) -> DataFrame:
    """Read transcript JSON file(s) into the canonical segment schema.

    ``path`` may be a single file, a glob, or a directory — one
    transcript document per file (multiLine JSON objects, exactly the
    reference's input layout).
    """
    raw = (
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("multiLine", "true")
        .json(path)
        .withColumn("doc_id", F.input_file_name())
    )
    seg = raw.select(
        "doc_id", F.posexplode("segments").alias("seg_id", "seg")
    )
    return seg.select(
        "doc_id",
        F.col("seg_id").cast("long"),
        F.col("seg.start").alias("start"),
        F.col("seg.end").alias("end"),
        F.col("seg.speaker").alias("speaker"),
        F.col("seg.text").alias("text"),
    )
