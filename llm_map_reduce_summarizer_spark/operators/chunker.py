"""Token-budget chunking (reference: big_chunkeroosky.py).

Two implementations:

* ``assign_chunks`` — the scale path. The reference's greedy
  accumulate-and-reset loop (big_chunkeroosky.py:80-145) is inherently
  sequential; we re-express it as a *prefix-sum bucketing*:
  ``chunk_id = floor(cum_tokens_before / budget)``. One window pass,
  parallel within and across transcripts, same budget discipline
  (each chunk's token sum stays within budget + one segment overshoot,
  exactly like the greedy version's last-segment overshoot rule).

* ``assign_chunks_greedy`` — faithful reset semantics via
  ``applyInPandas`` (parallel across transcripts, sequential within —
  the reference's own data dependency). Use when bit-level parity with
  the reference chunk boundaries matters more than the extra scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import format_timestamp, quantize, token_count


def _part(doc_col: str | None) -> list[str]:
    return [doc_col] if doc_col else []


def formatted_segment(with_speaker: bool = True):
    """'[MM:SS] speaker: text' (big_chunkeroosky._format_segment_for_chunk)."""
    ts = F.concat(F.lit("["), format_timestamp(F.col("start")), F.lit("] "))
    if with_speaker:
        return F.concat(ts, F.col("speaker"), F.lit(": "), F.col("text"))
    return F.concat(ts, F.col("text"))


def with_token_counts(segments: DataFrame) -> DataFrame:
    return segments.withColumn("seg_text", formatted_segment()).withColumn(
        "n_tokens", token_count(F.col("seg_text")).cast("long")
    )


def assign_chunks(
    segments: DataFrame,
    max_tokens_per_chunk: int = 500,
    doc_col: str | None = None,
) -> DataFrame:
    """Prefix-sum chunk assignment: one window, no sequential state."""
    part = _part(doc_col)
    w = Window.partitionBy(*part).orderBy("seg_id")
    counted = with_token_counts(segments)
    cum_prev = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return counted.withColumn(
        "chunk_id", F.floor(cum_prev / F.lit(max_tokens_per_chunk))
    )


def chunk_stats(
    chunked: DataFrame, doc_col: str | None = None
) -> DataFrame:
    """Per-chunk metadata: the reference's context header fields
    (big_chunkeroosky.py:147-232): time range, speakers, token count,
    position percentage (chunk-relative formula at :182-184).
    """
    part = _part(doc_col)
    wall = Window.partitionBy(*part)
    stats = (
        chunked.withColumn("t0", F.min("start").over(wall))
        .groupBy(*part, "chunk_id")
        .agg(
            F.min("start").alias("start_time"),
            F.max("end").alias("end_time"),
            F.sum("n_tokens").alias("token_count"),
            F.count(F.lit(1)).alias("n_segments"),
            F.array_join(F.array_sort(F.collect_set("speaker")), ", ").alias(
                "speakers"
            ),
            F.min("t0").alias("t0"),
        )
        .withColumn(
            "position_pct",
            F.when(
                F.col("end_time") > F.col("t0"),
                quantize(
                    100.0
                    * (F.col("start_time") - F.col("t0"))
                    / (F.col("end_time") - F.col("t0")),
                    4,
                ),
            ).otherwise(0.0),
        )
        .drop("t0")
    )
    return stats


GREEDY_SCHEMA = (
    "seg_id long, start double, end double, speaker string, "
    "seg_text string, n_tokens long, chunk_id long"
)


def assign_chunks_greedy(
    segments: DataFrame,
    max_tokens_per_chunk: int = 500,
    doc_col: str | None = None,
) -> DataFrame:
    """Faithful greedy accumulate-and-reset chunking.

    Parallel across transcripts (one pandas group per doc_col value),
    sequential within — the reference's own dependency structure
    (big_chunkeroosky.py:86-99). Oversized single segments keep their
    own chunk (sentence-splitting of pathological segments is handled
    upstream by merge caps).
    """
    counted = with_token_counts(segments).select(
        "seg_id", "start", "end", "speaker", "seg_text", "n_tokens",
        *( [doc_col] if doc_col else [] ),
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seg_id").reset_index(drop=True)
        chunk_ids, cid, acc = [], 0, 0
        for n in pdf["n_tokens"]:
            if acc > 0 and acc + n > max_tokens_per_chunk:
                cid += 1
                acc = 0
            chunk_ids.append(cid)
            acc += n
        pdf["chunk_id"] = chunk_ids
        return pdf[[
            "seg_id", "start", "end", "speaker", "seg_text", "n_tokens",
            "chunk_id",
        ]]

    if doc_col:
        return counted.groupBy(doc_col).applyInPandas(
            greedy, schema=f"{doc_col} long, " + GREEDY_SCHEMA
        )
    return counted.withColumn("_g", F.lit(0)).groupBy("_g").applyInPandas(
        lambda pdf: greedy(pdf.drop(columns=["_g"])), schema=GREEDY_SCHEMA
    )
