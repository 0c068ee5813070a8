"""Cross-engine fuzz parity for the shared Column/SQL function twins.

The oracle gate proves parity on the synthetic corpus; this fuzzes the
function layer itself — seeded random strings (unicode, repeated
whitespace, punctuation runs, empties) and doubles through the Spark
expression AND its DuckDB twin, compared value-for-value. A regex
subtlety that only bites on exotic input fails here first.
"""

from __future__ import annotations

import random
import string

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from llm_map_reduce_summarizer_spark.functions.text import (
    SQL_CLEAN,
    SQL_FMT_TS,
    SQL_TOKEN_COUNT,
    clean_text,
    format_timestamp,
    quantize,
    sql_quantize,
    token_count,
)

ALPHABETS = [
    string.ascii_letters,
    string.digits,
    ".!?,;: \t\n",
    "   ",
    "äöüßéàç日本語中文한국",
    "()[]{}<>#$%&*-_=+",
]


def _rand_strings(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    out = [""]
    for _ in range(n - 1):
        parts = []
        for _ in range(rng.randint(1, 40)):
            ab = rng.choice(ALPHABETS)
            parts.append("".join(rng.choice(ab) for _ in range(rng.randint(1, 8))))
        out.append("".join(parts))
    return out


@pytest.fixture(scope="module")
def fuzz_pdf():
    rng = random.Random(11)
    texts = _rand_strings(400)
    return pd.DataFrame(
        {
            "i": range(len(texts)),
            "txt": texts,
            "secs": [rng.uniform(0, 200_000) for _ in texts],
            "val": [rng.uniform(-1000, 1000) for _ in texts],
        }
    )


@pytest.mark.slow
def test_text_function_twins_agree(spark, fuzz_pdf):
    sdf = spark.createDataFrame(fuzz_pdf)
    got = (
        sdf.select(
            "i",
            clean_text(F.col("txt")).alias("cleaned"),
            token_count(F.col("txt")).cast("long").alias("ntok"),
            format_timestamp(F.col("secs")).alias("fmt"),
            quantize(F.col("val"), 4).alias("q4"),
        )
        .orderBy("i")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("fuzz", fuzz_pdf)
    want = con.execute(
        f"""
        SELECT i,
               {SQL_CLEAN.format(c='txt')} AS cleaned,
               CAST({SQL_TOKEN_COUNT.format(c='txt')} AS BIGINT) AS ntok,
               {SQL_FMT_TS.format(s='secs')} AS fmt,
               {sql_quantize('val', 4)} AS q4
        FROM fuzz ORDER BY i
        """
    ).df()
    for col in ["cleaned", "ntok", "fmt", "q4"]:
        mismatches = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(got[col], want[col]))
            if a != b and not (pd.isna(a) and pd.isna(b))
        ]
        assert not mismatches, f"{col}: first mismatches {mismatches[:3]}"


def test_repeated_word_fold_matches_java_backreference(spark):
    """seg_clean_full's oracle re-expresses the Java backreference rule
    `\\b(\\w+)( \\1\\b)+` as an RE2 list_reduce fold; fuzz token streams
    heavy in repeats/punctuation/unicode through BOTH engines."""
    from llm_map_reduce_summarizer_spark.functions.text import (
        SQL_DEDUP_WORDS,
        clean_text_full,
    )

    rng = random.Random(23)
    vocab = [
        "a", "ab", "value", "b", "x-y", "(a", "a)", "a,", "v.", "!a",
        "aa", "a_b", "9", "a9", "äa", "aä", "ä", "日本", "a.b",
    ]
    texts = [""]
    for _ in range(400):
        toks = []
        for _ in range(rng.randint(1, 10)):
            t = rng.choice(vocab)
            # bias toward immediate repeats — the rule under test
            toks.extend([t] * rng.randint(1, 3))
        texts.append(" ".join(toks))
    pdf = pd.DataFrame({"i": range(len(texts)), "txt": texts})

    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select("i", clean_text_full(F.col("txt")).alias("out"))
        .toPandas()
        .sort_values("i")["out"]
        .tolist()
    )
    con = duckdb.connect()
    try:
        con.register("fuzz", pdf)
        expr = SQL_DEDUP_WORDS.format(c=SQL_CLEAN.format(c="txt"))
        want = [
            r[0]
            for r in con.execute(
                f"SELECT {expr} FROM fuzz ORDER BY i"
            ).fetchall()
        ]
    finally:
        con.close()
    assert got == want


def test_pii_patterns_cross_engine(spark):
    """Emails/phones/IPv4 embedded in noisy text: Java and RE2 must
    agree on match counts AND the scrubbed text."""
    from llm_map_reduce_summarizer_spark.plans.documents import (
        PII_EMAIL,
        PII_IP,
        PII_PHONE,
    )

    rng = random.Random(5)
    frags = [
        "a.b@c.de", "x@y.z", "not@an", "u_1@ex-a.co", "@@", "a@b,c",
        "10.0.0.1", "999.1.2.3", "1.2.3", "1.2.3.4.5", "a1.2.3.4",
        "+1-555-0042", "+49-30-123456", "+1", "1-555-0042", "+12345678",
        "word", "w.w", "3.14", "..", "a-b", "()",
    ]
    texts = [""]
    for _ in range(300):
        texts.append(
            " ".join(rng.choice(frags) for _ in range(rng.randint(1, 8)))
        )
    pdf = pd.DataFrame({"i": range(len(texts)), "txt": texts})

    sdf = spark.createDataFrame(pdf)
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("txt", PII_EMAIL, "<EMAIL>"),
            PII_PHONE, "<PHONE>",
        ),
        PII_IP, "<IP>",
    )
    got = (
        sdf.select(
            "i",
            F.regexp_count("txt", F.lit(PII_EMAIL)).alias("e"),
            F.regexp_count("txt", F.lit(PII_PHONE)).alias("p"),
            F.regexp_count("txt", F.lit(PII_IP)).alias("ip"),
            scrub.alias("s"),
        )
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    try:
        con.register("fuzz", pdf)
        want = con.execute(f"""
            SELECT i,
                   len(regexp_extract_all(txt, '{PII_EMAIL}')) AS e,
                   len(regexp_extract_all(txt, '{PII_PHONE}')) AS p,
                   len(regexp_extract_all(txt, '{PII_IP}')) AS ip,
                   regexp_replace(regexp_replace(regexp_replace(
                     txt, '{PII_EMAIL}', '<EMAIL>', 'g'),
                     '{PII_PHONE}', '<PHONE>', 'g'),
                     '{PII_IP}', '<IP>', 'g') AS s
            FROM fuzz ORDER BY i
        """).df()
    finally:
        con.close()
    for col in ("e", "p", "ip", "s"):
        assert list(got[col]) == list(want[col]), col


def test_char_split_codepoint_parity_non_bmp(spark):
    """doc_char_entropy splits text with Spark's split(text, '') and
    the oracle with DuckDB's string_split(text, ''). Java's zero-width
    split advances by CODE POINTS (not UTF-16 units) since Java 8, so
    the two agree even on supplementary-plane characters — pinned here
    with emoji + supplementary CJK so engine drift (or a regression to
    a surrogate-splitting implementation) fails loudly instead of
    hash-mismatching the driver on future testdata."""
    samples = [
        "a\U0001F600b\U0001F389\U0001F389",  # emoji (plane 1)
        "\U00020BB7\U00020BB7x",  # supplementary CJK (plane 2)
        "plain ascii",
        "café 中文",  # BMP non-ASCII
        "",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [
        r["cs"]
        for r in df.select(
            F.split(F.col("text"), "").alias("cs"), "text"
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT string_split(?, '')", [s]
        ).fetchone()[0]
        for s in samples
    ]
    # row order: re-align by text since collect order is free
    got_by_text = {
        r["text"]: r["cs"]
        for r in df.select(
            "text", F.split(F.col("text"), "").alias("cs")
        ).collect()
    }
    for s, w in zip(samples, want):
        assert got_by_text[s] == w, (s, got_by_text[s], w)


def test_minhash_permutation_twins_agree(spark):
    """The keyed MinHash chain (string -> 60-bit shingle_key -> 16
    affine universal-hash minima) must be bit-identical across engines:
    every fold/product stays under 2^62 (DuckDB raises on BIGINT
    overflow — staying in range IS the contract) and the hex digit-fold
    must match Spark's conv()."""
    import random

    from llm_map_reduce_summarizer_spark.functions.hashing import (
        minhash_aggs,
        shingle_key,
        sql_minhash_aggs,
        sql_shingle_key,
    )

    rng = random.Random(42)
    shingles = [
        " ".join(
            "".join(rng.choice(string.ascii_lowercase) for _ in range(5))
            for _ in range(3)
        )
        for _ in range(200)
    ]
    pdf = pd.DataFrame({"doc_id": [i % 7 for i in range(200)], "s": shingles})
    sdf = spark.createDataFrame(pdf).select(
        "doc_id", shingle_key(F.col("s")).alias("s")
    )
    got = (
        sdf.groupBy("doc_id")
        .agg(*minhash_aggs("s"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("sh_raw", pdf)
    want = (
        con.execute(
            f"WITH sh AS (SELECT doc_id, {sql_shingle_key('s')} AS s "
            "FROM sh_raw) "
            f"SELECT doc_id, {sql_minhash_aggs()} FROM sh "
            "GROUP BY doc_id ORDER BY doc_id"
        )
        .df()
        .reset_index(drop=True)
    )
    # the key fold itself must also agree value-for-value
    got_keys = sorted(r["s"] for r in sdf.collect())
    want_keys = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {sql_shingle_key('s')} FROM sh_raw"
        ).fetchall()
    )
    assert got_keys == want_keys
    for c in got.columns:
        assert (got[c].astype("int64") == want[c].astype("int64")).all(), c
