"""Property-based check of the line-level boilerplate dedup family.

For ANY corpus (random line multisets with whitespace padding, blank
lines, intra-doc repeats) and ANY threshold, `line_dedup_stats` and
`line_dedup_scrub` must equal a direct pure-Python model of the CCNet
semantics: trim, drop blanks, doc-frequency over DISTINCT docs,
flag df >= min_df, stats count occurrences, scrub reassembles kept
lines in original order (all-boilerplate docs drop out).
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings, strategies as st

# a small pool so doc-frequencies collide; padding exercises trim
_POOL = ["alpha", " beta ", "gamma g", "delta", "  ", "", "eps", "zeta z "]

_corpus = st.lists(
    st.lists(st.integers(min_value=0, max_value=len(_POOL) - 1), max_size=8),
    min_size=1,
    max_size=12,
)


@pytest.fixture(scope="module")
def spark_holder(spark):
    # hypothesis can't take function-scoped fixtures
    return spark


@settings(max_examples=15, deadline=None)
@given(corpus=_corpus, min_df=st.integers(min_value=1, max_value=4))
def test_line_dedup_family_equals_python_model(spark_holder, corpus, min_df):
    spark = spark_holder
    docs = [(i, "\n".join(_POOL[j] for j in doc)) for i, doc in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    from lightsaber_spark.functions.dedup import line_dedup_scrub, line_dedup_stats

    # ---- pure-Python model ----
    def doc_lines(text):
        return [ln.strip() for ln in text.split("\n") if ln.strip() != ""]

    df_count: dict[str, int] = {}
    for _, text in docs:
        for line in set(doc_lines(text)):
            df_count[line] = df_count.get(line, 0) + 1
    flagged = {l for l, c in df_count.items() if c >= min_df}

    want_stats, want_scrub = {}, {}
    for did, text in docs:
        lines = doc_lines(text)
        if not lines:
            continue
        boiler = [l for l in lines if l in flagged]
        kept = [l for l in lines if l not in flagged]
        want_stats[did] = (
            len(lines),
            len(boiler),
            len(kept),
            sum(len(l) for l in boiler),
        )
        if kept:
            want_scrub[did] = (
                len(kept),
                hashlib.md5("\n".join(kept).encode()).hexdigest(),
            )

    # ---- engine ----
    got_stats = {
        r.doc_id: (r.n_lines, r.n_boilerplate, r.n_kept, r.chars_removed)
        for r in line_dedup_stats(df, min_df=min_df).collect()
    }
    got_scrub = {
        r.doc_id: (r.n_kept, r.clean_md5)
        for r in line_dedup_scrub(df, min_df=min_df).collect()
    }
    assert got_stats == want_stats, f"min_df={min_df}"
    assert got_scrub == want_scrub, f"min_df={min_df}"
