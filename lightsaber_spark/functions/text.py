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


# ---------------------------------------------------------------------------
# BM25-style relevance (logarithm-free, cross-engine exact)
# ---------------------------------------------------------------------------

def bm25_select(relation: str, terms, k: int = 20,
                k1: float = 1.2, b: float = 0.75) -> str:
    """SQL computing a BM25-style score over ``relation(doc_id, dl,
    tf0..tfN)`` — one tf column per query term, dl = document length.

    The classic idf ``log((N-df+0.5)/(df+0.5))`` is used WITHOUT the
    log: the ratio is monotone in the same direction, and dropping the
    transcendental keeps every operation rational IEEE-double
    arithmetic over exact integers — the same SQL text runs on Spark
    and DuckDB and produces bit-identical doubles, so the top-k (ties
    broken by doc_id) is strongly checkable. The scalar subqueries
    (N, avgdl, per-term df) each execute once and inline as literals.
    """
    avgdl = (f"(SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
             f"FROM {relation})")
    n_docs = f"(SELECT CAST(count(*) AS DOUBLE) FROM {relation})"
    parts = []
    for i, _ in enumerate(terms):
        df_i = (f"(SELECT CAST(count(*) AS DOUBLE) FROM {relation} "
                f"WHERE tf{i} > 0)")
        idf = f"((({n_docs} - {df_i}) + 0.5) / ({df_i} + 0.5))"
        tfn = (
            f"((CAST(tf{i} AS DOUBLE) * {k1 + 1.0}) / "
            f"(CAST(tf{i} AS DOUBLE) + ({k1} * ({1.0 - b} + ({b} * "
            f"(CAST(dl AS DOUBLE) / {avgdl}))))))"
        )
        parts.append(f"({idf} * {tfn})")
    score = " + ".join(parts)
    return f"""
    SELECT doc_id, score, rnk FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM (SELECT doc_id, {score} AS score FROM {relation}) s
    ) r WHERE rnk <= {k}
    """


def term_tf_table(df: DataFrame, terms, text_col: str = "text") -> DataFrame:
    """Per-document term frequencies for a fixed query-term list:
    ``(doc_id, dl, tf0..tfN)``. Fixed columns instead of an exploded
    posting list — the per-term sum order is then written in the plan,
    which keeps double addition order-independent-by-construction."""
    toks = tokens(F.col(text_col))
    cols = [F.col("doc_id"), F.size(toks).cast("bigint").alias("dl")]

    # one-arg lambda via factory: a two-parameter lambda would be
    # interpreted by F.filter as (element, index)
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    for i, t in enumerate(terms):
        cols.append(
            F.size(F.filter(toks, _eq(t))).cast("bigint").alias(f"tf{i}")
        )
    return df.select(*cols)


def feature_hash_vector(c: Column, k: int = 16) -> Column:
    """Hashing-trick token-count vector (``array<bigint>`` of length
    ``k``): bucket = 60-bit md5 hash of the token mod ``k``, value =
    token count in the bucket. Deterministic across engines (DuckDB
    twin: ``list_transform(range(k), i -> len(list_filter(toks, x ->
    h60(x) % k = i)))``).

    The nested higher-order-function form is O(k·tokens) interpreted —
    fine for feature building at moderate k; for a hot 100 TB path
    switch to an Arrow-batched pandas UDF that hashes each token once
    (same pattern as ``winnow_fingerprints_udf``)."""
    toks = tokens(c)
    h = lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("bigint")  # noqa: E731
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.size(
            F.filter(toks, lambda x: h(x) % k == i.cast("bigint"))
        ).cast("bigint"),
    )
