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


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    from llm_map_reduce_summarizer_spark.sources.files import (
        read_orc,
        write_orc,
    )
    from llm_map_reduce_summarizer_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out, partition_by=["lang"])
    back = read_orc(spark, out)
    assert back.count() == docs.count()
    # partition pruning on the hive layout
    import contextlib
    import io

    from pyspark.sql import functions as F

    pruned = back.filter(F.col("lang") == "en")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(mode="formatted")
    assert "lang" in buf.getvalue().split("PartitionFilters: [", 1)[1].split("]")[0]
    assert pruned.count() == docs.filter(F.col("lang") == "en").count()


def test_text_and_binary_file_sources(spark, tmp_path):
    from llm_map_reduce_summarizer_spark.sources.files import (
        read_binary_files,
        read_text_files,
    )

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("line one\nline two\n", encoding="utf-8")
    (p / "b.txt").write_text("line three\n", encoding="utf-8")
    lines = read_text_files(spark, str(p))
    assert lines.count() == 3

    blobs = read_binary_files(spark, str(p / "*.txt"))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in blobs.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert bytes(rows["a.txt"]["content"]).startswith(b"line one")
    assert rows["b.txt"]["length"] == len("line three\n")
