"""Join utilities for skew: explicit key salting.

AQE's skew-join split (on by default in session.py) handles most skew
by splitting oversized partitions at runtime. Salting is the static
fallback for the pathological case AQE can't fix: ONE key so hot that
even a split partition's build side overflows — replicate the small
side across ``n_salts`` sub-keys and scatter the big side's hot rows
uniformly among them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s hot keys spread over n_salts buckets.

    The big side salts each row deterministically (hash of the full row
    modulo n_salts — no rand(), so retried tasks stay consistent); the
    small side replicates n_salts times. Join key becomes (on, salt),
    so one hot key fans out to n_salts shuffle partitions.
    """
    spark = big.sparkSession
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).cast("int")
    big_s = big.withColumn("_salt", salt)
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    small_s = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")
