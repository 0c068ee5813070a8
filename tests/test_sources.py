"""Source/sink round-trips (SURVEY.md §2.8)."""

from __future__ import annotations

import os

from llm_map_reduce_summarizer_spark.sources.files import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_parquet,
)
from llm_map_reduce_summarizer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_parquet_partitioned_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    out = os.path.join(str(tmp_path), "events_by_type")
    write_parquet(ev, out, partition_by=["event_type"])
    # hive-style layout gives partition pruning on the key
    assert any(d.startswith("event_type=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    one_type = back.filter(back.event_type == "view")
    assert 0 < one_type.count() < ev.count()


def test_csv_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "lang", "source")
    out = os.path.join(str(tmp_path), "docs_csv")
    write_csv(docs, out)
    back = read_csv(spark, out, schema=docs.schema)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)


def test_jsonl_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    out = os.path.join(str(tmp_path), "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, schema=docs.schema)
    assert back.count() == docs.count()
    assert back.agg({"n_chars": "sum"}).collect()[0][0] == docs.agg(
        {"n_chars": "sum"}
    ).collect()[0][0]
