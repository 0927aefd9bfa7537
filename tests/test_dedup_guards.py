"""API guards on the dedup family (round-7 robustness fixes)."""

from __future__ import annotations

import pytest

from lightsaber_spark.functions.dedup import duplicate_groups


def test_duplicate_groups_rejects_zero_iters(spark):
    """iters=0 has no labels relation to return — must raise up front
    instead of crashing with an undefined-variable error mid-plan."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["id_a", "id_b"]
    )
    with pytest.raises(ValueError, match="iters must be >= 1"):
        duplicate_groups(pairs, iters=0)


def test_duplicate_groups_one_iter_is_valid(spark):
    """iters=1 is the minimum meaningful round count: one min-label +
    pointer-jump pass, which fully labels a single-edge component."""
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    rows = {
        r.member: r.representative
        for r in duplicate_groups(pairs, iters=1).collect()
    }
    assert rows == {1: 1, 2: 1}


def test_line_dedup_stats_flags_exactly_the_repeated_lines(spark):
    """Hand-computed fixture: the shared footer (df=3 >= min_df=3) is
    boilerplate; body lines and unique trailers (df=1) are kept; empty
    and whitespace-only lines are ignored; a line repeated twice
    WITHIN one doc counts both occurrences but one doc-frequency."""
    from lightsaber_spark.functions.dedup import line_dedup_stats

    footer = "all rights reserved"
    rows = [
        (1, f"alpha body one\n{footer}\nref 1"),
        (2, f"beta body two\n\n   \n{footer}\nref 2"),
        (3, f"{footer}\ngamma body\n{footer}\nref 3"),  # footer twice
        (4, "delta body only\nref 4"),                  # no footer
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_lines, r.n_boilerplate, r.n_kept, r.chars_removed)
        for r in line_dedup_stats(df, min_df=3).collect()
    }
    L = len(footer)
    assert got == {
        1: (3, 1, 2, L),
        2: (3, 1, 2, L),
        3: (4, 2, 2, 2 * L),
        4: (2, 0, 2, 0),
    }


def test_line_dedup_scrub_reassembles_kept_lines_in_order(spark):
    """Hand-computed fixture for the removal half: clean_md5 must equal
    md5 of the surviving lines re-joined in ORIGINAL order (trimmed,
    blanks dropped), and a document whose every line is boilerplate
    must drop out of the result entirely."""
    import hashlib

    from lightsaber_spark.functions.dedup import line_dedup_scrub

    footer = "all rights reserved"
    rows = [
        (1, f"alpha body one\n{footer}\nref 1"),
        (2, f"beta body two\n\n   \n{footer}\nref 2"),
        (3, f"{footer}\ngamma body\n{footer}\nref 3"),
        (4, f"{footer}\n\n{footer}"),  # all-boilerplate: drops out
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_kept, r.clean_md5)
        for r in line_dedup_scrub(df, min_df=3).collect()
    }

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert got == {
        1: (2, h("alpha body one\nref 1")),
        2: (2, h("beta body two\nref 2")),
        3: (2, h("gamma body\nref 3")),
    }


def test_line_dedup_stats_threshold_boundary(spark):
    """df == min_df is boilerplate; df == min_df - 1 is not."""
    from lightsaber_spark.functions.dedup import line_dedup_stats

    rows = [(i, "shared in two\nshared in three\nuniq %d" % i) for i in (1, 2)]
    rows.append((3, "shared in three\nuniq 3"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_lines, r.n_boilerplate) for r in line_dedup_stats(df, min_df=3).collect()
    }
    # 'shared in three' df=3 -> boilerplate; 'shared in two' df=2 -> kept
    assert got == {1: (3, 1), 2: (3, 1), 3: (2, 1)}


def test_shingles_short_and_null_docs_are_safe(spark):
    """Review findings (r11 continuation), both live-reproduced before
    the fix: (a) the Catalyst word_shingles form crashed on any doc
    with fewer than k tokens (sequence(1, 0) counts DOWN to [1, 0] and
    slice with start 0 throws); (b) the Arrow text UDFs crashed the
    whole job on a NULL text (None.lower()). Short/empty/null docs now
    yield empty shingle sets in both forms, which stay identical."""
    from pyspark.sql import functions as F

    from lightsaber_spark.functions.dedup import (
        minhash_band_keys_udf,
        positional_shingles_udf,
        simhash_udf,
        word_shingles,
        word_shingles_udf,
    )

    df = spark.createDataFrame(
        [(1, "one two"), (2, None), (3, ""), (4, "a b c d")],
        "doc_id long, text string",
    )
    expr = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("s")
        ).collect()
    }
    udf = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", word_shingles_udf(3)(F.col("text")).alias("s")
        ).collect()
    }
    assert expr[1] == [] and expr[2] == [] and expr[3] == []
    assert expr[4] == ["a b c", "b c d"]
    assert udf == expr

    sh = {
        r.doc_id: r.v
        for r in df.select(
            "doc_id", simhash_udf(60)(F.col("text")).alias("v")
        ).collect()
    }
    assert sh[2] is None and sh[3] is None and sh[4] is not None

    pos = {
        r.doc_id: r.v
        for r in df.select(
            "doc_id", positional_shingles_udf(3)(F.col("text")).alias("v")
        ).collect()
    }
    assert pos[2] == [] and pos[3] == [] and pos[4] == ["a b c", "b c d"]

    bk = {
        r.doc_id: r.v
        for r in df.select(
            "doc_id", minhash_band_keys_udf()(F.col("text")).alias("v")
        ).collect()
    }
    assert bk[2] == [] and bk[3] == [] and len(bk[4]) == 8


def test_brute_force_topk_empty_query_set(spark):
    """An empty query relation returns an empty result with the normal
    schema instead of an opaque np.stack ValueError."""
    from pyspark.sql import functions as F

    from lightsaber_spark.functions.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    out = brute_force_topk(corpus.filter(F.col("vec_id") < 0), corpus, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cosine", "rank",
    ]
