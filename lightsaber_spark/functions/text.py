"""Text analysis for large-scale training-data pipelines.

Beyond-parity surface (the reference has NO string functions at all —
SURVEY.md §2.2): language ID, quality scoring, token counting, document
fingerprinting. All pure Catalyst expressions (no UDFs): at 100 TB these
run inside whole-stage codegen with full pushdown.

Cross-engine determinism: every operation bottoms out in integer counts,
md5 (bit-identical everywhere), or integer-ratio doubles — so DuckDB
oracles can reproduce results exactly.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — required so pandas-UDF type hints resolve
from pyspark.sql import Column, DataFrame, functions as F

# word tokens: ASCII alphanumerics (identical semantics in Java regex and
# RE2); BPE-ish tokens additionally split digit runs and symbol runs
WORD_RE = "[a-z0-9]+"
BPE_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with",
)

# language marker patterns (tiny heuristic; deterministic; patterns are
# written to behave identically under Java regex and RE2)
LANG_PATTERNS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|et|les|des)\b",
    "es": r"\b(el|los|que|por|una)\b",
    "zh": "[一-鿿]",  # CJK ideograph count
}


def winnow_fingerprints_udf(k: int = 3, window: int = 4):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the standard rolling-hash fingerprint scheme): hash every k-word
    shingle *in order*, slide a ``window``-wide frame over the hash
    sequence, keep the minimum of each frame, return the distinct
    selected hashes. Guarantees any shared run of ≥ window+k-1 tokens
    between two documents shares ≥ 1 fingerprint.

    Arrow-batched; hashes are the same 60-bit md5-prefix integers used
    everywhere else, so a DuckDB oracle reproduces them exactly.
    """
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    tok_re = _re.compile(r"[a-z0-9]+")

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    @pandas_udf("array<bigint>")
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = tok_re.findall(t.lower())
            n = max(len(toks) - (k - 1), 0)
            hs = np.fromiter(
                (h60(" ".join(toks[i : i + k])) for i in range(n)),
                dtype=np.int64, count=n,
            )
            if len(hs) == 0:
                out.append([])
                continue
            if len(hs) <= window:
                out.append([int(hs.min())])
                continue
            frames = np.lib.stride_tricks.sliding_window_view(hs, window)
            out.append(sorted({int(x) for x in frames.min(axis=1)}))
        return pd.Series(out)

    return _fp


def normalize_text(c: Column) -> Column:
    """lowercase + whitespace collapse — the canonical form every dedup
    / fingerprint op hashes."""
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def tokens(c: Column, pattern: str = WORD_RE) -> Column:
    """Array of tokens (lowercased match of ``pattern``)."""
    return F.regexp_extract_all(F.lower(c), F.lit(pattern), F.lit(0))


def token_count(c: Column, pattern: str = WORD_RE) -> Column:
    return F.size(tokens(c, pattern)).cast("bigint")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: char/token counts, punctuation ratio,
    stopword ratio, mean token length — the standard cheap quality
    gates for pretraining corpora. Ratios are integer/integer divisions
    (order-independent, oracle-exact)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("bigint")
    n_token_chars = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_computed"),
        n_tokens.alias("n_tokens"),
        (n_punct / n_chars).alias("punct_ratio"),
        F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        F.when(n_tokens > 0, n_token_chars / n_tokens).otherwise(F.lit(0.0)).alias("mean_token_len"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_punct_permille: int = 150,
    max_stopword_permille: int = 600,
) -> DataFrame:
    """The quality GATE: keep documents passing the standard cheap
    pretraining filters. All comparisons are exact integer arithmetic
    (``n_punct·1000 ≤ max‰·n_chars``) — no float thresholds, so the
    keep/drop decision is bit-stable across engines and data orders."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    n_punct = F.size(
        F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("bigint")
    return df.filter(
        (n_tokens >= min_tokens)
        & (n_punct * 1000 <= F.lit(max_punct_permille) * n_chars)
        & (n_stop * 1000 <= F.lit(max_stopword_permille) * n_tokens)
    )


def language_id(c: Column) -> Column:
    """Marker-pattern language heuristic: count hits per language, take
    the argmax (ties → lexicographically larger code, consistent with
    array_max struct ordering in both Spark and DuckDB)."""
    lc = F.lower(c)
    entries = []
    for lang, pat in sorted(LANG_PATTERNS.items()):
        cnt = F.size(F.regexp_extract_all(lc, F.lit(pat), F.lit(0)))
        entries.append(F.struct(cnt.alias("c"), F.lit(lang).alias("l")))
    return F.array_max(F.array(*entries))["l"]


def doc_fingerprint(c: Column) -> Column:
    """60-bit content fingerprint: md5 of the normalized text, upper 15
    hex digits as bigint. Deterministic across engines
    (DuckDB: ``('0x'||substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(normalize_text(c)), 1, 15), 16, 10).cast("bigint")
