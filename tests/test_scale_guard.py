"""The exact all-pairs Jaccard tool's verification-set-only contract is
ENFORCED, not just documented (VERDICT r7 item 2): `jaccard_pairs`
raises above a configurable distinct-doc cap, exactly like the
contamination benchmark's CONTAM_BENCH_MAX_DOCS guard. These tests
prove the raise fires, that the conf overrides it both ways, and that
the guarded plan entries still run at test scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_map_reduce_summarizer_spark.operators.dedup import (
    EXACT_JACCARD_CONF,
    doc_shingles,
    jaccard_pairs,
)
from tests.conftest import SF_SMOKE


@pytest.fixture
def tiny_shingles(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i}") for i in range(8)],
        "doc_id long, text string",
    )
    return doc_shingles(docs, keyed=True)


def _with_conf(spark, value):
    old = spark.conf.get(EXACT_JACCARD_CONF, None)
    spark.conf.set(EXACT_JACCARD_CONF, value)
    return old


def _restore_conf(spark, old):
    if old is None:
        spark.conf.unset(EXACT_JACCARD_CONF)
    else:
        spark.conf.set(EXACT_JACCARD_CONF, old)


def test_guard_raises_above_cap(spark, tiny_shingles):
    old = _with_conf(spark, "5")
    try:
        with pytest.raises(ValueError, match="minhash_lsh_pairs"):
            jaccard_pairs(tiny_shingles, threshold=0.5)
    finally:
        _restore_conf(spark, old)


def test_guard_allows_at_or_below_cap(spark, tiny_shingles):
    old = _with_conf(spark, "8")
    try:
        df = jaccard_pairs(tiny_shingles, threshold=0.5)
        assert df.count() >= 0  # plan builds and executes
    finally:
        _restore_conf(spark, old)


def test_guard_disabled_by_zero(spark, tiny_shingles):
    old = _with_conf(spark, "0")
    try:
        df = jaccard_pairs(tiny_shingles, threshold=0.5)
        assert df.count() >= 0
    finally:
        _restore_conf(spark, old)


def test_guarded_plan_entries_run_at_test_scale(spark):
    """ALL THREE exact-Jaccard catalog entries stay under the default
    cap on the gate data (the guard must never fire on driver runs) —
    a cap/conf change that trips any of them at gate scale fails
    here, not in the driver."""
    from llm_map_reduce_summarizer_spark.plans.documents import (
        dedup_lsh_recall,
        dedup_ngram_jaccard,
        dedup_threshold_sweep,
    )

    assert dedup_ngram_jaccard(spark, SF_SMOKE).count() >= 0
    assert dedup_threshold_sweep(spark, SF_SMOKE).count() >= 0
    assert dedup_lsh_recall(spark, SF_SMOKE).count() >= 0


def test_guard_honors_caller_bound(spark, tiny_shingles):
    """`n_docs` (the caller's metadata-count upper bound, ADVICE r8)
    replaces the countDistinct pre-flight: the guard raises/passes on
    the BOUND, not the shingle table's actual distinct count — that is
    what makes a passing call a single shingle scan."""
    old = _with_conf(spark, "100")
    try:
        # actual distinct docs = 8, well under the cap — but the
        # caller's bound is over it, so the guard must raise
        with pytest.raises(ValueError, match="minhash_lsh_pairs"):
            jaccard_pairs(tiny_shingles, threshold=0.5, n_docs=101)
        df = jaccard_pairs(tiny_shingles, threshold=0.5, n_docs=100)
        assert df.count() >= 0
    finally:
        _restore_conf(spark, old)


def test_guard_message_names_cap_and_conf(spark, tiny_shingles):
    old = _with_conf(spark, "3")
    try:
        with pytest.raises(ValueError) as ei:
            jaccard_pairs(tiny_shingles, threshold=0.5)
        msg = str(ei.value)
        assert EXACT_JACCARD_CONF in msg and "8 distinct documents > 3" in msg
    finally:
        _restore_conf(spark, old)
