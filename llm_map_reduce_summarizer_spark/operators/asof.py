"""As-of (backward) join — attach the most recent right-side row at or
before each left row's timestamp, per key.

Spark has no native ASOF join; the classic sort-merge re-expression is
a single union + one window pass:

    tag left/right -> union -> per-key window ordered by (ts, right
    first) -> last(value, ignorenulls) carries the latest right value
    forward -> keep left rows.

One shuffle total (the window's hash exchange on the key), no range
join, no per-row probing — at 100 TB this is the shape a time-series
enrichment (quotes→trades, views→clicks, config→events) must take.
Equal timestamps: the right row sorts first, so a same-instant right
value is visible to the left row (matches ASOF's ``left.ts >=
right.ts`` convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    pick: dict[str, str],
) -> DataFrame:
    """For each left row: latest right row with right.ts <= left.ts.

    ``pick`` maps output column -> right column to carry. Left columns
    pass through; missing matches yield NULLs (ASOF LEFT JOIN).
    """
    r = right.select(
        F.col(on),
        F.col(ts_col),
        *[F.col(src).alias(f"_r_{dst}") for dst, src in pick.items()],
    ).withColumn("_is_left", F.lit(0))
    l = left.withColumn("_is_left", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for dst in pick:
        u = u.withColumn(
            dst, F.last(f"_r_{dst}", ignorenulls=True).over(w)
        )
    return u.filter(F.col("_is_left") == 1).drop(
        "_is_left", *[f"_r_{dst}" for dst in pick]
    )
