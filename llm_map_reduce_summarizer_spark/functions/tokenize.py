"""Token counting backends: regex (default) and tiktoken (high fidelity).

The reference counts tokens with tiktoken (big_chunkeroosky.py:10,43 —
``tiktoken.get_encoding("cl100k_base")``), so its chunk boundaries are
BPE-exact. The engine's default counter is a deterministic BPE-ish
regex (functions/text.py TOKEN_PATTERN) that any ANSI engine can mirror
for oracle checks; this module adds the opt-in tiktoken path as an
Arrow-batched Pandas UDF so boundaries reproduce the reference's
exactly when the library is installed.

Scale: the UDF is vectorized (one ``encode_batch`` per Arrow batch,
encoder object cached per executor process by tiktoken itself), so the
cost is the BPE encode proper, not per-row Python dispatch. Still, the
regex counter runs JVM-side inside whole-stage codegen — keep it the
default and reach for tiktoken only when byte-exact parity with an
OpenAI-tokenizer budget matters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

try:  # optional dependency — not in the minimal runtime image
    import tiktoken

    HAS_TIKTOKEN = True
except ImportError:  # pragma: no cover - exercised via HAS_TIKTOKEN gates
    tiktoken = None
    HAS_TIKTOKEN = False

DEFAULT_ENCODING = "cl100k_base"  # reference big_chunkeroosky.py:27


def tiktoken_count(col: Column, encoding_name: str = DEFAULT_ENCODING) -> Column:
    """Exact BPE token count via tiktoken (reference parity path).

    Raises ``NotImplementedError`` when tiktoken is not installed —
    callers choose the fallback explicitly (see ``token_count_column``);
    a silent downgrade would corrupt token budgets without warning.
    """
    if not HAS_TIKTOKEN:
        raise NotImplementedError(
            "tiktoken is not installed; use counter='regex' or install "
            "tiktoken for reference-exact token counts"
        )

    @pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        enc = tiktoken.get_encoding(encoding_name)  # process-cached
        toks = enc.encode_ordinary_batch(s.fillna("").astype(str).tolist())
        return pd.Series([len(t) for t in toks], index=s.index)

    return _count(col)


def token_count_column(
    col: Column, counter: str = "regex", encoding_name: str = DEFAULT_ENCODING
) -> Column:
    """Select a token-count backend.

    - ``regex``: deterministic JVM-side count (oracle-expressible).
    - ``tiktoken``: reference-exact BPE count (requires tiktoken).
    - ``auto``: tiktoken when installed, else regex.
    """
    from .text import token_count

    if counter == "tiktoken" or (counter == "auto" and HAS_TIKTOKEN):
        return tiktoken_count(col, encoding_name)
    if counter in ("regex", "auto"):
        return token_count(col)
    raise ValueError(f"unknown token counter: {counter!r}")
