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

from .persist import materialize


def _ordered_join(ord_col: str, text_col: str, sep: str):
    pairs = F.collect_list(
        F.struct(F.col(ord_col).alias("o"), F.col(text_col).alias("t"))
    )
    return F.array_join(F.transform(F.array_sort(pairs), lambda x: x["t"]), sep)


def _templated(joined, template: str):
    """Custom aggregation template: the reference substitutes the
    ordered summaries into the template's ``{summaries}`` slot
    (result_aggregator.py:184 ``prompt_template.replace``); with no
    slot the template text stands alone, mirroring str.replace."""
    pre, slot, post = template.partition("{summaries}")
    if not slot:
        return F.lit(template)
    return F.concat(F.lit(pre), joined, F.lit(post))


def reduce_level(
    df: DataFrame,
    ord_col: str = "chunk_id",
    text_col: str = "summary",
    batch_size: int = 10,
    header: str = "# Intermediate Summary",
    template: str | None = None,
) -> DataFrame:
    """One tree level: group ord//batch_size, join summaries in order.

    ``template`` (final level only in practice) replaces the default
    ``header N\\njoined`` format with the custom aggregator prompt.
    """
    batch = F.floor(F.col(ord_col) / F.lit(batch_size)).alias("batch_id")
    grouped = df.groupBy(batch).agg(
        _ordered_join(ord_col, text_col, "\n\n").alias("joined"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    if template is not None:
        text = _templated(F.col("joined"), template)
    else:
        text = F.concat(
            F.lit(header + " "),
            F.col("batch_id").cast("string"),
            F.lit("\n"),
            F.col("joined"),
        )
    return grouped.select(
        F.col("batch_id").alias(ord_col),
        text.alias(text_col),
        "n_parts",
    )


def hierarchical_reduce(
    df: DataFrame,
    ord_col: str = "chunk_id",
    text_col: str = "summary",
    batch_size: int = 10,
    template: str | None = None,
) -> DataFrame:
    """Tree-reduce to a single final-summary row (log-depth groupBys).

    Each level is localCheckpointed (eager): the per-level ``count`` and
    the next reduction read materialized partitions, so level k never
    re-executes levels 1..k-1 — O(L) scans of shrinking data instead of
    the O(L^2) full-lineage recompute a lazy loop would do. The
    checkpointed sets shrink by batch_size per level, so executor
    storage cost is a geometric series bounded by ~2x level 1.
    """
    out = df.transform(materialize)
    level = 0
    n = out.count()
    while n > 1:
        is_final = n <= batch_size
        header = (
            "# Transcript Summary" if is_final else "# Intermediate Summary"
        )
        out = reduce_level(
            out, ord_col, text_col, batch_size, header,
            template=template if is_final else None,
        )
        out = out.transform(materialize)
        level += 1
        n = out.count()
    if level == 0 and template is not None:
        # single input row: the reference still formats it through the
        # custom aggregation template
        out = out.withColumn(text_col, _templated(F.col(text_col), template))
    return out.select(
        F.col(text_col).alias("summary"), F.lit(level).alias("levels")
    )


def with_time_headers(
    summaries: DataFrame,
    start_col: str = "start_time",
    end_col: str = "end_time",
    text_col: str = "summary",
) -> DataFrame:
    """Prepend the reference's '[Time: MM:SS - MM:SS]' position header
    to each chunk summary (result_aggregator.py:86-88)."""
    from ..functions.text import format_timestamp

    header = F.concat(
        F.lit("[Time: "),
        format_timestamp(F.col(start_col)),
        F.lit(" - "),
        format_timestamp(F.col(end_col)),
        F.lit("]\n"),
    )
    return summaries.withColumn(text_col, F.concat(header, F.col(text_col)))


def dynamic_batch_size(
    total_tokens: int, n_summaries: int, budget: int, reserved: int = 1000
) -> int:
    """Reference batch sizing (result_aggregator.py:357-380):
    max(1, (budget - reserved) / avg_tokens), capped at 10."""
    if n_summaries == 0:
        return 1
    avg = total_tokens / n_summaries
    return min(max(1, int((budget - reserved) / avg)), 10)


def reduce_direct(
    df: DataFrame,
    ord_col: str = "chunk_id",
    text_col: str = "summary",
    header: str = "# Transcript Summary",
    template: str | None = None,
) -> DataFrame:
    """Single-pass combine of ALL summaries (the reference's direct /
    simple-aggregator mode: result_aggregator.py:111-118)."""
    return reduce_level(
        df, ord_col, text_col, 1_000_000_000, header, template=template
    )


def reduce_auto(
    df: DataFrame,
    token_col: str,
    ord_col: str = "chunk_id",
    text_col: str = "summary",
    batch_budget: int = 4000,
    batch_size: int = 10,
) -> DataFrame:
    """The reference's mode decision (result_aggregator.py:94-100):
    direct combine when everything fits one batch, else hierarchical.

    The one-scalar total-token read is a driver-side PLAN decision
    (like AQE's runtime re-plan), not a data collect — the data itself
    never leaves the cluster.
    """
    total = df.agg(F.sum(token_col)).collect()[0][0] or 0
    if total <= batch_budget:
        out = reduce_direct(df, ord_col, text_col)
        return out.select(
            text_col, "n_parts", F.lit("direct").alias("mode")
        )
    level1 = reduce_level(
        df, ord_col, text_col, batch_size, "# Intermediate Summary"
    )
    level2 = reduce_level(
        level1, ord_col, text_col, 1_000_000_000, "# Transcript Summary"
    )
    return level2.select(text_col, "n_parts", F.lit("hierarchical").alias("mode"))
