"""Hierarchical summary reduction (reference: result_aggregator.py).

The reference batches summaries (≤10/batch), summarizes each batch,
then combines batch summaries — a 2-level tree. On Spark each level is
one ``groupBy(ord // batch_size)`` with an order-stable string
aggregation; ``hierarchical_reduce`` iterates levels driver-side until
one row remains, giving ``ceil(log_B(n))`` shrinking shuffles — the
map-side partial aggregation does most of the combining before any
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordered_join(ord_col: str, text_col: str, sep: str):
    pairs = F.collect_list(
        F.struct(F.col(ord_col).alias("o"), F.col(text_col).alias("t"))
    )
    return F.array_join(F.transform(F.array_sort(pairs), lambda x: x["t"]), sep)


def reduce_level(
    df: DataFrame,
    ord_col: str = "chunk_id",
    text_col: str = "summary",
    batch_size: int = 10,
    header: str = "# Intermediate Summary",
) -> DataFrame:
    """One tree level: group ord//batch_size, join summaries in order."""
    batch = F.floor(F.col(ord_col) / F.lit(batch_size)).alias("batch_id")
    return (
        df.groupBy(batch)
        .agg(
            _ordered_join(ord_col, text_col, "\n\n").alias("joined"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .select(
            F.col("batch_id").alias(ord_col),
            F.concat(
                F.lit(header + " "),
                F.col("batch_id").cast("string"),
                F.lit("\n"),
                F.col("joined"),
            ).alias(text_col),
            "n_parts",
        )
    )


def hierarchical_reduce(
    df: DataFrame,
    ord_col: str = "chunk_id",
    text_col: str = "summary",
    batch_size: int = 10,
) -> DataFrame:
    """Tree-reduce to a single final-summary row (log-depth groupBys)."""
    level = 0
    n = df.count()
    out = df
    while n > 1:
        header = (
            "# Intermediate Summary" if n > batch_size else "# Transcript Summary"
        )
        out = reduce_level(out, ord_col, text_col, batch_size, header)
        level += 1
        n = out.count()
    return out.select(
        F.col(text_col).alias("summary"), F.lit(level).alias("levels")
    )
