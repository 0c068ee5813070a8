"""Chunk 'LLM' map stage (reference: llm_executor.py).

The reference fans chunks out to an LLM API with a semaphore; on Spark
the fan-out IS the cluster — each partition's chunks are processed by
its executor, so parallelism = partitions, and rate limiting becomes
partition count × per-partition batching.

Two paths:

* ``summarize_chunks`` — deterministic extractive summarizer in pure
  Column expressions (the default, mirrors the reference's keyless
  mock provider: llm_executor.py:411-432). JVM-side, codegen'd,
  oracle-expressible.

* ``SparkLLMExecutor`` — pluggable batch executor over
  ``mapInPandas`` for real model calls: a provider callable maps a
  batch of prompts to completions. Network calls happen inside the
  Arrow batch iterator (one session per partition, retries included) —
  the Spark-native shape of the reference's asyncio semaphore loop.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PROMPT = "Please summarize the following transcript segment:\n\n{transcript}"


def resolve_prompt(
    explicit: str | None = None,
    prompt_file: str | None = None,
    default: str = DEFAULT_PROMPT,
) -> str:
    """The reference's prompt-resolution priority (main.py:155-167):
    explicit template > template file > built-in default. A missing or
    unreadable file falls back to the default rather than failing the
    pipeline."""
    if explicit:
        return explicit
    if prompt_file:
        try:
            with open(prompt_file, encoding="utf-8") as f:
                content = f.read().strip()
            if content:
                return content
        except OSError:
            pass
    return default


def extractive_summary(
    text_col: Column, chunk_id_col: Column, n_tokens_col: Column, head_chars: int = 150
) -> Column:
    """Deterministic 'summary': header stats + leading extract."""
    return F.concat(
        F.lit("SUMMARY["),
        chunk_id_col.cast("string"),
        F.lit("] tokens="),
        n_tokens_col.cast("string"),
        F.lit(": "),
        F.substring(text_col, 1, head_chars),
    )


def summarize_chunks(chunk_texts: DataFrame, head_chars: int = 150) -> DataFrame:
    """Add a deterministic extractive ``summary`` per chunk row.

    Expects columns (chunk_id, text, token_count).
    """
    return chunk_texts.withColumn(
        "summary",
        extractive_summary(
            F.col("text"), F.col("chunk_id"), F.col("token_count"), head_chars
        ),
    )


# ---------------------------------------------------------------------
# Pluggable executor (real-LLM path; default provider = offline mock)


def mock_provider(prompts: list[str], model: str = "mock-model") -> list[str]:
    """Keyless deterministic provider (mirrors llm_executor mock)."""
    return [
        f"[Mock response using {model}]\n\nSimulated summary of a "
        f"{len(p)}-char prompt." for p in prompts
    ]


class SparkLLMExecutor:
    """Distribute per-chunk prompt completion across the cluster.

    provider: ``(list[str]) -> list[str]`` executed per Arrow batch on
    executors. Retries with bounded attempts; failures produce the
    reference's '[Error processing chunk: ...]' sentinel rather than
    failing the job (llm_executor.py:216-228).
    """

    def __init__(
        self,
        provider: Callable[[list[str]], list[str]] | None = None,
        prompt_template: str = DEFAULT_PROMPT,
        system_prompt: str | None = None,
        retry_attempts: int = 3,
        batch_size: int = 16,
    ):
        self.provider = provider or mock_provider
        self.prompt_template = prompt_template
        self.system_prompt = system_prompt
        self.retry_attempts = retry_attempts
        self.batch_size = batch_size

    def process_chunks(self, chunks: DataFrame, text_col: str = "text") -> DataFrame:
        provider = self.provider
        template = self.prompt_template
        system = self.system_prompt
        attempts = self.retry_attempts
        bs = self.batch_size
        out_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in chunks.schema.fields
        ) + ", summary string"

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                prompts = [
                    ((system + "\n\n") if system else "")
                    + template.format(transcript=t)
                    for t in pdf[text_col].astype(str)
                ]
                outs: list[str] = []
                for i in range(0, len(prompts), bs):
                    batch = prompts[i : i + bs]
                    for attempt in range(attempts):
                        try:
                            outs.extend(provider(batch))
                            break
                        except Exception as exc:  # noqa: BLE001
                            if attempt == attempts - 1:
                                outs.extend(
                                    [f"[Error processing chunk: {exc}]"] * len(batch)
                                )
                yield pdf.assign(summary=outs)

        return chunks.mapInPandas(run, schema=out_schema)
