"""Whole-catalog plan audit: every queries() entry must stay free of
the two scale killers — cartesian products over row data and
row-at-a-time Python UDF evaluation. A new operator that regresses
either fails here even if its results are still correct."""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
QUERIES = entrymod.queries()

# availableNow streaming drains execute eagerly and don't expose a
# batch plan to audit here (their operators are covered in
# tests/test_streaming.py)
SKIP = {"stream_hourly", "stream_sessionize"}


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k not in SKIP))
def test_no_cartesian_no_row_udf(spark, name):
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"


def test_chunk_greedy_is_not_single_task(spark):
    """The greedy chunker must parallelize across transcripts: its
    exchange must hash-partition on the transcript key, never collapse
    to one global pandas group."""
    df = QUERIES["chunk_greedy"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan, "greedy chunker runs as one task"
    assert "hashpartitioning(transcript" in plan
