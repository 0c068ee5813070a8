"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001.
``queries()`` maps every implemented operator (SURVEY.md §2) to a
``(spark, sf_dir) -> DataFrame`` callable. ``oracle_sql()`` gives the
DuckDB-ANSI twin for each key (omitted only for genuinely
non-SQL-expressible ops, which the driver checks rows-only).

Catalog order is mechanical and round-independent: plan modules sorted
alphabetically by module name, each module's entries in its own
definition order. ``queries()`` and ``oracle_sql()`` share the same
ordering rule.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_PLAN_MODULES = []

from llm_map_reduce_summarizer_spark.plans import tpch

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

# Alphabetical by unqualified module name — a fixed, neutral rule.
_PLAN_MODULES.sort(key=lambda m: m.__name__.rsplit(".", 1)[-1])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    for mod in _PLAN_MODULES:
        if "pipeline_e2e" in getattr(mod, "QUERIES", {}):
            return mod.QUERIES["pipeline_e2e"](spark, "/root/testdata/sf0.001")
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _PLAN_MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _PLAN_MODULES:
        merged.update(mod.ORACLE)
    # same key order as queries(), so positional consumers stay paired
    return {k: merged[k] for k in queries() if k in merged}
