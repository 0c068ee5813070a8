"""Similarity search over embedding columns.

Scale design: vectors are unit-normalized ONCE (one scan), so every
pairwise comparison is a single dot product — at 100 TB this turns the
dominant cost from 3 chained reductions per pair into 1, and the
normalized corpus can be written back and reused across queries.

* ``cosine_topk`` — exact baseline: broadcast the (small) query set
  against the corpus; the corpus is scanned once, never shuffled, and
  the per-query top-k is a window over query_id partitions.
* ``cosine_topk_lsh`` — scale path: sign-bit LSH bucket join prunes
  the compare set to bucket-local candidates before ranking.
* ``embedding_neardup`` — near-duplicate pairs by cosine threshold;
  bucket-join variant for corpus × corpus at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import quantize
from ..functions.vectors import dot, sign_bucket, unit_norm


def _unit(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        unit_norm(F.col(vec_col)).alias(f"u_{out_id}"),
        F.col(vec_col).alias(f"v_{out_id}"),
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = _unit(queries, id_col, vec_col, "query_id")
    c = _unit(corpus, id_col, vec_col, "neighbor_id")
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos", quantize(dot(F.col("u_query_id"), F.col("u_neighbor_id")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket."""
    q = _unit(queries, id_col, vec_col, "query_id").withColumn(
        "bucket", sign_bucket(F.col("v_query_id"))
    )
    c = _unit(corpus, id_col, vec_col, "neighbor_id").withColumn(
        "bucket", sign_bucket(F.col("v_neighbor_id"))
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos", quantize(dot(F.col("u_query_id"), F.col("u_neighbor_id")), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("query_id", "bucket", "neighbor_id", "cos", "rk")
    )


def embedding_neardup(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (exact; bucket for scale)."""
    a = _unit(corpus, id_col, vec_col, "da")
    b = _unit(corpus, id_col, vec_col, "db")
    return (
        a.crossJoin(b)
        .filter(F.col("da") < F.col("db"))
        .withColumn("cos", quantize(dot(F.col("u_da"), F.col("u_db")), 6))
        .filter(F.col("cos") >= threshold)
        .select("da", "db", "cos")
    )
