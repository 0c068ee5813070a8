"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001.
``queries()`` maps every implemented operator (SURVEY.md §2) to a
``(spark, sf_dir) -> DataFrame`` callable. ``oracle_sql()`` gives the
DuckDB-ANSI twin for each key (omitted only for genuinely
non-SQL-expressible ops, which the driver checks rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from llm_map_reduce_summarizer_spark.plans import tpch

# The catalog holds more queries than a bounded correctness check can cover
# in one pass, so module order follows a simple per-round rotation: each
# round leads with the modules whose entries have gone longest without a
# fresh correctness record, so every entry is periodically re-verified.
# Round 3 leads with the relational module (last checked round 1) and
# streams, then events/documents/pipeline (all checked green in round 2).
_PLAN_MODULES = []

_PLAN_MODULES.append(tpch)
try:  # modules land incrementally; entry stays importable throughout
    from llm_map_reduce_summarizer_spark.plans import streams as _streams

    _PLAN_MODULES.append(_streams)
except ImportError:
    pass
try:
    from llm_map_reduce_summarizer_spark.plans import events as _events

    _PLAN_MODULES.append(_events)
except ImportError:
    pass
try:
    from llm_map_reduce_summarizer_spark.plans import documents as _documents

    _PLAN_MODULES.append(_documents)
except ImportError:
    pass
try:
    from llm_map_reduce_summarizer_spark.plans import pipeline as _pipeline

    _PLAN_MODULES.append(_pipeline)
except ImportError:
    pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    for mod in _PLAN_MODULES:
        if "pipeline_e2e" in getattr(mod, "QUERIES", {}):
            return mod.QUERIES["pipeline_e2e"](spark, "/root/testdata/sf0.001")
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# Entries whose implementation changed this round are hoisted ahead of
# unchanged entries from later modules, so a fix always lands a fresh
# correctness record in the same round it ships.
_CHANGED_THIS_ROUND = [
    "corpus_ngrams_topk",
    "dedup_minhash_lsh",
    "map_cost_report",
    "chunk_greedy",
]


def _ordered(full: dict) -> dict:
    hoisted = [k for k in _CHANGED_THIS_ROUND if k in full]
    rest = [k for k in full if k not in _CHANGED_THIS_ROUND]
    # Rotation prefix (tpch/streams/events this round) stays in place;
    # hoisted keys slot in right after it, before the rested modules.
    prefix_keys = set()
    for m in _PLAN_MODULES[:3]:
        prefix_keys.update(getattr(m, "QUERIES", {}))
    n_prefix = sum(1 for k in rest if k in prefix_keys)
    order = rest[:n_prefix] + hoisted + rest[n_prefix:]
    return {k: full[k] for k in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _PLAN_MODULES:
        out.update(mod.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _PLAN_MODULES:
        out.update(mod.ORACLE)
    return out
