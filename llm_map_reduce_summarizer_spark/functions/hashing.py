"""Hash-based Column builders for dedup: shingles, MinHash, SimHash.

Everything is derived from md5 hex strings so any ANSI engine computes
bit-identical values (Spark's murmur ``hash()`` is engine-specific; md5
is not). MinHash minima are *lexicographic minima of hex strings* —
order-isomorphic to numeric minima of the underlying 128-bit values,
and portable.

Reference: these are the scale-path operators the reference repo lacks
(its dedup surface is the LLM pipeline's implicit uniqueness of chunk
ids) — added per the training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

N_MINHASH = 16  # signature length
BAND_ROWS = 4  # rows per LSH band -> 4 bands


def words(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def shingles_3gram(w: Column) -> Column:
    """All word-3-gram shingles (requires >= 3 tokens; guard upstream).

    1-based element_at matches the SQL twin's 1-based list indexing.
    """
    idx = F.sequence(F.lit(1), F.size(w) - 2)
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
        ),
    )


def minhash_aggs(shingle_col: str = "s") -> list[Column]:
    """16 MinHash aggregate expressions over an exploded shingle column."""
    return [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col(shingle_col)))).alias(f"h{j}")
        for j in range(N_MINHASH)
    ]


def band_hashes() -> list[Column]:
    """LSH band keys: md5 over each group of BAND_ROWS signature values."""
    out = []
    for k in range(N_MINHASH // BAND_ROWS):
        cols = [F.col(f"h{j}") for j in range(k * BAND_ROWS, (k + 1) * BAND_ROWS)]
        out.append(F.md5(F.concat(*cols)).alias(f"band{k}"))
    return out


def simhash16_aggs(token_col: str = "t") -> Column:
    """16-bit SimHash from per-hex-digit high-bit majority of md5(token).

    bit_p = majority over tokens of (md5(token)[p] >= '8') — the hex
    digit's high bit. Pure string comparisons, portable to any engine.
    Returns the fingerprint as a bigint aggregate expression.
    """
    h = F.md5(F.col(token_col))
    bits = []
    for p in range(1, 17):
        hit = F.when(F.substring(h, p, 1) >= "8", 1).otherwise(0)
        bit = F.when(
            F.sum(hit) * 2 > F.count(F.lit(1)), F.lit(2 ** (p - 1))
        ).otherwise(F.lit(0))
        bits.append(bit)
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long").alias("simhash")


# ------------------------------------------------------------- SQL twins

SQL_WORDS = r"regexp_split_to_array(lower(trim({c})), '\s+')"

SQL_SHINGLES = (
    "list_transform(generate_series(1, len({w}) - 2),"
    " i -> {w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2])"
)


def sql_minhash_aggs() -> str:
    return ", ".join(
        f"min(md5('{j}|' || s)) AS h{j}" for j in range(N_MINHASH)
    )


def sql_band_hashes() -> str:
    parts = []
    for k in range(N_MINHASH // BAND_ROWS):
        cols = " || ".join(
            f"h{j}" for j in range(k * BAND_ROWS, (k + 1) * BAND_ROWS)
        )
        parts.append(f"md5({cols}) AS band{k}")
    return ", ".join(parts)


def sql_simhash16(token_col: str = "t") -> str:
    terms = []
    for p in range(1, 17):
        terms.append(
            f"CASE WHEN sum(CASE WHEN substr(md5({token_col}), {p}, 1) >= '8' "
            f"THEN 1 ELSE 0 END) * 2 > count(*) THEN {2 ** (p - 1)} ELSE 0 END"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
