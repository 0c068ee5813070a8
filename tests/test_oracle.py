"""THE correctness gate: every queries() entry vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (sf0.01, column-sorted,
order-insensitive value compare) so mismatches are caught locally.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from .conftest import SF_CORRECT, SF_SMOKE
from .oracle_utils import run_compare

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()
KEYS_WITH_ORACLE = sorted(k for k in QUERIES if k in ORACLE)
KEYS_ROWS_ONLY = sorted(k for k in QUERIES if k not in ORACLE)


@pytest.mark.parametrize("key", KEYS_WITH_ORACLE)
def test_oracle_match_sf001(spark, key):
    problems = run_compare(spark, SF_CORRECT, QUERIES[key], ORACLE[key])
    assert not problems, f"{key}: " + "; ".join(problems)


def test_every_entry_has_an_oracle():
    """r7: the last three rows-only entries (emb_pca_project,
    knn_ivf_trained, multimodal_decode) were converted to invariant
    oracles — no catalog entry may regress to rows-only."""
    assert KEYS_ROWS_ONLY == []


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_all_queries_run_smoke(spark):
    from pyspark.sql.types import ArrayType, MapType, StructType

    for key, fn in QUERIES.items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, key
        # the driver's canonicalizer sorts rows via pandas, which
        # cannot factorize nested cells — an array/map/struct output
        # column crashes even the rows-only check (the r5 regression
        # class: emb_pca_project/multimodal_features shipped red).
        # Catalog entries must posexplode/digest nested shapes.
        for f in df.schema.fields:
            assert not isinstance(
                f.dataType, (ArrayType, MapType, StructType)
            ), f"{key}.{f.name} is {f.dataType.simpleString()}"
