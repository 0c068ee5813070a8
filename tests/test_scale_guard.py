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


# ----------------------------------------------------- embedding family
#
# The r9 scaling ladder measured the fixed-16-block exact-cosine
# operator OOMing the box at 100x (each applyInPandas group held an
# (n/16)^2-double sims matrix). The fix has two enforced halves:
# adaptive block count (constant per-task memory) and the same
# verification-set cap contract as jaccard_pairs.

from llm_map_reduce_summarizer_spark.operators.similarity import (  # noqa: E402
    EXACT_COSINE_CONF,
    NEARDUP_BLOCK_ROWS,
    NEARDUP_MIN_BLOCKS,
    _neardup_n_blocks,
    _quantize_np,
    embedding_neardup_blocked,
)


@pytest.fixture
def tiny_vecs(spark):
    return spark.createDataFrame(
        [(i, [float(i % 3), 1.0, float(i % 2)]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )


def _with_cos_conf(spark, value):
    old = spark.conf.get(EXACT_COSINE_CONF, None)
    spark.conf.set(EXACT_COSINE_CONF, value)
    return old


def _restore_cos_conf(spark, old):
    if old is None:
        spark.conf.unset(EXACT_COSINE_CONF)
    else:
        spark.conf.set(EXACT_COSINE_CONF, old)


def test_cosine_guard_raises_above_cap(spark, tiny_vecs):
    old = _with_cos_conf(spark, "5")
    try:
        with pytest.raises(ValueError, match="cosine_knn_graph"):
            embedding_neardup_blocked(tiny_vecs, threshold=0.5)
    finally:
        _restore_cos_conf(spark, old)


def test_cosine_guard_allows_at_cap_and_zero_disables(spark, tiny_vecs):
    for conf in ("12", "0"):
        old = _with_cos_conf(spark, conf)
        try:
            df = embedding_neardup_blocked(tiny_vecs, threshold=0.5)
            assert df.count() >= 0
        finally:
            _restore_cos_conf(spark, old)


def test_cosine_guard_honors_caller_bound(spark, tiny_vecs):
    """`n_vecs` (the caller's footer-metadata bound) replaces the
    internal count(): the guard fires on the BOUND — that is what lets
    a UDF-bearing corpus frame (multimodal_neardup's features) guard
    without executing its UDF scan twice."""
    old = _with_cos_conf(spark, "100")
    try:
        with pytest.raises(ValueError, match="101 vectors > 100"):
            embedding_neardup_blocked(tiny_vecs, n_vecs=101)
        assert embedding_neardup_blocked(tiny_vecs, n_vecs=100).count() >= 0
    finally:
        _restore_cos_conf(spark, old)


def test_adaptive_blocks_bound_task_memory():
    """Block height never exceeds NEARDUP_BLOCK_ROWS above the floor —
    the invariant that makes per-task sims matrices a constant
    ~block_rows^2 doubles at ANY corpus size."""
    assert _neardup_n_blocks(0) == NEARDUP_MIN_BLOCKS
    assert _neardup_n_blocks(2_000) == NEARDUP_MIN_BLOCKS
    for n in (200_000, 1_000_000, 7_777_777):
        b = _neardup_n_blocks(n)
        assert -(-n // b) <= NEARDUP_BLOCK_ROWS  # ceil(n/b) rows/block
    # 100x-ladder shape: 200k vectors -> 49 blocks of <=4096 rows
    assert _neardup_n_blocks(200_000) == 49


def test_blocking_is_result_invariant(spark, tiny_vecs):
    """The emitted pair set is EXACT all-pairs — independent of B.
    (The adaptive count only reshapes the physical plan; any drift
    here would break the frozen DuckDB oracles.)"""
    rows = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    a = rows(embedding_neardup_blocked(tiny_vecs, threshold=0.3, n_blocks=1))
    b = rows(embedding_neardup_blocked(tiny_vecs, threshold=0.3, n_blocks=5))
    c = rows(embedding_neardup_blocked(tiny_vecs, threshold=0.3))
    assert a == b == c and len(a) > 0


def test_inplace_quantize_matches_allocating_path():
    """In-place quantize is the identical float64 arithmetic — only
    the allocation strategy differs (it exists so a block's sims
    matrix is the task's ONLY matrix-sized allocation)."""
    import numpy as np

    rng = np.random.default_rng(11)
    x = rng.uniform(-1.0, 1.0, size=(257, 263))
    expected = _quantize_np(x.copy())
    got = _quantize_np(x.copy(), inplace=True)
    assert np.array_equal(expected, got)


# ------------------------------------------- broadcast-closure operators
#
# The r9 100x scale sweep (tools/run_scale_sweep.py) caught two keys
# violating the broadcast-closure operators' documented-but-unenforced
# "closure side is broadcast-small" contract: knn_graph_recall passed
# the whole corpus as cosine_topk_blocked's query matrix and
# emb_dedup_incremental screened a half-corpus delta. The contract is
# now enforced via a limit(cap+1) fetch — an oversized side raises
# BEFORE it lands on the driver — and the closure-side dgemms run in
# bounded column chunks.

from llm_map_reduce_summarizer_spark.operators.similarity import (  # noqa: E402
    BROADCAST_SIDE_CONF,
    cosine_screen_broadcast,
    cosine_topk_blocked,
)


def _with_side_conf(spark, value):
    old = spark.conf.get(BROADCAST_SIDE_CONF, None)
    spark.conf.set(BROADCAST_SIDE_CONF, value)
    return old


def _restore_side_conf(spark, old):
    if old is None:
        spark.conf.unset(BROADCAST_SIDE_CONF)
    else:
        spark.conf.set(BROADCAST_SIDE_CONF, old)


def test_topk_query_side_guard(spark, tiny_vecs):
    old = _with_side_conf(spark, "5")
    try:
        with pytest.raises(ValueError, match="cosine_topk_lsh"):
            cosine_topk_blocked(tiny_vecs, tiny_vecs, k=2)
        # at/under the cap and 0-disabled both run
        for conf in ("12", "0"):
            _with_side_conf(spark, conf)
            assert cosine_topk_blocked(tiny_vecs, tiny_vecs, k=2).count() > 0
    finally:
        _restore_side_conf(spark, old)


def test_screen_delta_side_guard(spark, tiny_vecs):
    old = _with_side_conf(spark, "5")
    try:
        with pytest.raises(ValueError, match="cosine_knn_graph"):
            cosine_screen_broadcast(tiny_vecs, tiny_vecs, 0.5)
        for conf in ("12", "0"):
            _with_side_conf(spark, conf)
            assert (
                cosine_screen_broadcast(tiny_vecs, tiny_vecs, 0.5).count()
                >= 0
            )
    finally:
        _restore_side_conf(spark, old)


def test_column_chunking_is_result_invariant(spark):
    """Chunked closure-side dgemms emit exactly what one big dgemm
    did. The chunk constant is patched down to 3 so a 7-query set
    spans multiple chunks, then top-k parity is checked against the
    expression-tree exact operator and screen parity against a
    single-matrix numpy reference."""
    import numpy as np

    from llm_map_reduce_summarizer_spark.operators import similarity as S

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.normal(size=6)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 7)
    want = sorted(
        map(tuple, S.cosine_topk(q, df, k=3).collect())
    )
    # force multi-chunk execution: patch the module constant down
    orig = S._DGEMM_COL_CHUNK
    S._DGEMM_COL_CHUNK = 3
    try:
        got_topk = sorted(
            map(tuple, cosine_topk_blocked(q, df, k=3).collect())
        )
        got_screen = cosine_screen_broadcast(q, df, 0.2).collect()
    finally:
        S._DGEMM_COL_CHUNK = orig
    assert got_topk == want
    # screen parity: every (bid, match_id) pair above threshold from a
    # single-matrix reference computed in numpy
    m = np.stack([r[1] for r in rows])
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.floor(u[:7] @ u.T * 1e6 + 0.5) / 1e6
    want_pairs = {
        (q_i, c_i)
        for q_i in range(7)
        for c_i in range(40)
        if sims[q_i, c_i] >= 0.2
    }
    got_pairs = {(r["bid"], r["match_id"]) for r in got_screen}
    assert got_pairs == want_pairs
