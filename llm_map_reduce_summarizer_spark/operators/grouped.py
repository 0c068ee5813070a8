"""Partition-batched grouped-map: ``groupBy(keys).applyInPandas`` with
one Python invocation per ARROW BATCH instead of per group.

``applyInPandas`` pays its fixed cost per GROUP — an Arrow slice, a
fresh pandas frame, a Python call, a result concat, each ~1-2 ms. The
banded/bucketed scorers (LSH kNN buckets, byte-histogram bands) have
thousands of near-empty groups by design (constant target occupancy),
so at gate scales the per-group overhead IS the stage: the sf0.1 kNN
graph spends ~2.3 s pushing 8k rows through 1024 groups whose dgemms
are microseconds each (guide §4 — the boundary cost is per crossing,
so cross per batch, not per row/group).

``grouped_map_batched`` keeps the same shuffle (hash repartition by
the keys), adds a cheap within-partition sort so groups arrive
contiguously, and runs the caller's UNCHANGED per-group function from
inside ``mapInPandas``, grouping each batch in pandas. A group that
straddles a batch boundary is carried into the next batch (the sort
makes the straddler exactly the batch's tail), so per-task memory is
one batch + one group — the same bound ``applyInPandas`` has.

Results are identical: the per-group function sees the same rows
(order within a group is as unspecified as under ``applyInPandas``,
and every caller is row-order invariant), and emitted row order is as
meaningless as before (consumers aggregate, window, or sort).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_map_batched(
    df: DataFrame,
    keys: list[str],
    fn: Callable,
    schema: str,
    with_key: bool = False,
) -> DataFrame:
    """Equivalent of ``df.groupBy(*keys).applyInPandas(fn, schema)``
    with per-batch (not per-group) Python dispatch.

    ``fn``: the unchanged per-group function — ``fn(pdf)`` or, with
    ``with_key=True``, ``fn(key_tuple, pdf)`` exactly as
    ``applyInPandas`` would call it. The group frame includes the key
    columns and carries a fresh 0..n-1 index.
    """
    keys = list(keys)
    shuffled = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *keys
    )

    def _run(batches):
        import pandas as pd

        def _apply(body):
            outs = []
            # dropna=False: SQL groupBy (and applyInPandas) treat NULL
            # as a normal group key; pandas' default would drop it
            for key, g in body.groupby(keys, sort=False, dropna=False):
                if not isinstance(key, tuple):
                    key = (key,)
                g = g.reset_index(drop=True)
                out = fn(key, g) if with_key else fn(g)
                if out is not None and len(out):
                    outs.append(out)
            if outs:
                yield pd.concat(outs, ignore_index=True)

        pending = None
        for pdf in batches:
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if not len(pdf):
                continue
            # the partition is sorted by the keys, so the (possibly
            # batch-straddling) final group is exactly the tail block.
            # NULL-safe match: a plain == is all-False against a null
            # key (NaN != NaN in pandas), which would split a
            # straddling null-keyed group across batches and emit two
            # partial results.
            mask = None
            for k in keys:
                last = pdf[k].iat[-1]
                m = pdf[k].isna() if pd.isna(last) else (pdf[k] == last)
                mask = m if mask is None else (mask & m)
            pending = pdf.loc[mask]
            body = pdf.loc[~mask]
            if len(body):
                yield from _apply(body)
        if pending is not None and len(pending):
            yield from _apply(pending)

    return shuffled.mapInPandas(_run, schema=schema)
