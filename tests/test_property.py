"""Property-based invariants (hypothesis) for the chunking operators.

The oracle gate pins exact values on the synthetic corpus; these pin
the INVARIANTS on arbitrary inputs — budget respected, ids contiguous,
order preserved — so a logic regression that happens to dodge the
fixed corpus still fails.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from llm_map_reduce_summarizer_spark.operators.chunker import (
    assign_chunks,
    assign_chunks_greedy,
)

BUDGET = 40

seg_lists = st.lists(
    st.integers(min_value=1, max_value=12),  # words per segment
    min_size=1,
    max_size=30,
)


def _segments(spark, words_per_seg):
    rows = [
        (i, float(i * 10), float(i * 10 + 8), "S", " ".join(["tok"] * n))
        for i, n in enumerate(words_per_seg)
    ]
    return spark.createDataFrame(
        rows, "seg_id long, start double, end double, speaker string, text string"
    )


@settings(max_examples=25, deadline=None)
@given(words_per_seg=seg_lists)
def test_greedy_chunker_invariants(spark, words_per_seg):
    out = (
        assign_chunks_greedy(_segments(spark, words_per_seg), BUDGET)
        .orderBy("seg_id")
        .toPandas()
    )
    # every input segment appears exactly once, in order
    assert list(out["seg_id"]) == list(range(len(words_per_seg)))
    # chunk ids start at 0, are contiguous, and never decrease
    cids = list(out["chunk_id"])
    assert cids[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(cids, cids[1:]))
    # the reference reset rule: a chunk only exceeds the budget when it
    # is a single oversized segment; and a segment moved to a fresh
    # chunk would NOT have fit in the previous one
    by_chunk = out.groupby("chunk_id")["n_tokens"]
    for cid, toks in by_chunk:
        if toks.sum() > BUDGET:
            assert len(toks) == 1
    firsts = out[out["chunk_id"].diff() == 1]
    prev_sums = by_chunk.sum()
    for _, row in firsts.iterrows():
        assert prev_sums[row["chunk_id"] - 1] + row["n_tokens"] > BUDGET


@settings(max_examples=25, deadline=None)
@given(words_per_seg=seg_lists)
def test_prefix_sum_chunker_invariants(spark, words_per_seg):
    out = (
        assign_chunks(_segments(spark, words_per_seg), BUDGET)
        .orderBy("seg_id")
        .toPandas()
    )
    assert list(out["seg_id"]) == list(range(len(words_per_seg)))
    # prefix-sum bucketing: chunk_id == floor(tokens_before / budget)
    cum_before = out["n_tokens"].cumsum() - out["n_tokens"]
    assert list(out["chunk_id"]) == list(cum_before // BUDGET)
