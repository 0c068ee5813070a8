"""Vector Column builders for embedding similarity.

Cosine similarity is built as an explicit left-associated 64-term
product chain in double precision: IEEE addition order then matches the
SQL twin term-for-term, so both engines produce bit-identical doubles
(sqrt and division are correctly-rounded IEEE ops).

At 100 TB prefer pre-normalizing vectors once (`unit_norm`) so top-k
scans do dot products only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DIM = 64


def dot(a: Column, b: Column, dim: int = DIM) -> Column:
    out: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        out = out + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
            "double"
        )
    return out


def cosine(a: Column, b: Column, dim: int = DIM) -> Column:
    return dot(a, b, dim) / (
        F.sqrt(dot(a, a, dim)) * F.sqrt(dot(b, b, dim))
    )


def sign_bucket(a: Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign bits of the first n_bits dims.

    Axis-aligned random-hyperplane LSH with fixed planes — portable and
    oracle-expressible; swap in seeded random planes for production
    recall tuning.
    """
    out: Column = F.lit(0)
    for b in range(1, n_bits + 1):
        out = out + F.when(
            F.element_at(a, b) >= 0, F.lit(2 ** (b - 1))
        ).otherwise(F.lit(0))
    return out.cast("long")


# ------------------------------------------------------------- SQL twins


def sql_dot(a: str, b: str, dim: int = DIM) -> str:
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return f"(0.0 + {terms})"


def sql_cosine(a: str, b: str, dim: int = DIM) -> str:
    return (
        f"({sql_dot(a, b, dim)} / "
        f"(sqrt({sql_dot(a, a, dim)}) * sqrt({sql_dot(b, b, dim)})))"
    )


def sql_sign_bucket(a: str, n_bits: int = 8) -> str:
    terms = " + ".join(
        f"CASE WHEN {a}[{b}] >= 0 THEN {2 ** (b - 1)} ELSE 0 END"
        for b in range(1, n_bits + 1)
    )
    return f"CAST(({terms}) AS BIGINT)"
