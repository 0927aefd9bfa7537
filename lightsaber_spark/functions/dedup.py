"""Deduplication for large-scale training-data pipelines.

Beyond-parity surface: exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup — the standard dedup ladder for pretraining
corpora. Everything is DataFrame-native (no Python UDFs) and built on
cross-engine-deterministic hashing (md5-hex→bigint), so each op has an
exact DuckDB oracle.

Scale design (100 TB):
- exact dedup: one hash-groupBy on a 128-bit digest — the only full
  shuffle, map-side combinable.
- n-gram Jaccard / MinHash verification: inverted-index shingle join
  with a document-frequency cutoff (`max_doc_freq`) to drop stop
  shingles — without it one hot shingle produces O(n²) candidate pairs.
- MinHash LSH: signatures are one aggregation; banding turns all-pairs
  similarity into an equi-join on (band, bucket).
- SimHash: 4 bands × 15 bits ⇒ pigeonhole-exact retrieval for hamming
  distance ≤ 3 via equi-joins, no pairwise scan.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from lightsaber_spark.functions.text import normalize_text, tokens

# 2^61 - 1 (Mersenne prime) for minhash permutations; shingle hashes are
# truncated to 30 bits so a*x+b stays < 2^63 (no overflow under ANSI mode)
MERSENNE_61 = (1 << 61) - 1
X_BITS = 1 << 30


def _lcg_constants(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) minhash permutation constants — embedded
    identically into the Spark plan and the oracle SQL."""
    out = []
    state = seed
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state >> 10) % (X_BITS - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = (state >> 10) % MERSENNE_61
        out.append((a, b))
    return out


def shingle_hash(c: Column) -> Column:
    """60-bit deterministic hash of a string (md5 hex prefix → bigint);
    DuckDB twin: ``('0x'||substr(md5(x),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def word_shingles(c: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text (k-grams over
    word tokens — the unit of Jaccard/MinHash similarity).

    Pure-Catalyst form. NOTE: higher-order functions (transform/slice)
    are interpreted, not codegen'd — ~1.4 ms/doc. The hot paths use
    :func:`word_shingles_udf` (Arrow-batched pandas UDF, ~10× faster,
    identical output); this expression form remains for UDF-free
    contexts."""
    toks = tokens(c)
    n = F.size(toks)
    # sequence(1, 0) steps DOWN to [1, 0] (it never yields empty), and
    # slice(toks, 0, k) then throws — a short/empty doc crashed the
    # whole job (review finding, live-reproduced). Guard the < k case
    # to the UDF twin's [] instead.
    idx = F.sequence(F.lit(1), n - (k - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return F.when(n >= F.lit(k), F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles_udf(k: int = 3):
    """Arrow-batched shingle extractor, semantically identical to
    :func:`word_shingles` (same token regex, same dedupe). Python here
    beats the Catalyst expression because Spark evaluates higher-order
    array functions interpreted per element, while this runs C-backed
    regex + joins per batch — the usual UDFs-are-slow rule inverts."""
    tok_re = re.compile(r"[a-z0-9]+")

    @F.pandas_udf("array<string>")
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:  # null text → no shingles, not a job kill
                out.append([])
                continue
            toks = tok_re.findall(t.lower())
            out.append(
                list(dict.fromkeys(
                    " ".join(toks[i : i + k]) for i in range(max(len(toks) - (k - 1), 0))
                ))
            )
        return pd.Series(out)

    return _sh


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by md5 of normalized text: one row per
    duplicated digest with the representative (min id) and member count.
    At scale: single map-side-combinable aggregation."""
    digest = F.md5(normalize_text(F.col(text_col))).alias("digest")
    return (
        df.select(digest, F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("representative"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .filter(F.col("n_members") > 1)
    )


def keep_representatives(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize the exact-deduplicated corpus: for each
    normalized-text digest keep only the representative row (min id) —
    the consuming half of :func:`exact_dup_groups` (which only reports
    the duplicate groups). One shuffle (window min over the digest);
    no join back against the corpus, so columns pass through
    untouched."""
    from pyspark.sql import Window

    digest = F.md5(normalize_text(F.col(text_col)))
    rep = F.min(id_col).over(Window.partitionBy(digest))
    return df.withColumn("_rep", rep).filter(
        F.col(id_col) == F.col("_rep")
    ).drop("_rep")


def line_dedup_stats(
    df: DataFrame,
    min_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Line-level boilerplate dedup stats (CCNet / RefinedWeb style:
    drop lines repeated across many documents — nav bars, cookie
    banners, footers). Per document: total non-empty lines, how many
    are boilerplate (line doc-frequency >= ``min_df``), how many
    survive, and the character mass removed.

    Shape at 100 TB: explode → 60-bit line-hash (bounded-width join
    key, never the raw line text) → one doc-frequency aggregation →
    filter to the BOILERPLATE set only (df >= min_df — the broadcast
    side is the small flagged-line table, ~corpus_lines/min_df worst
    case and tiny in practice, never the full distinct-line table) →
    LEFT equi-join back on the hash → one per-doc aggregation. No
    collects, no all-pairs; AQE falls back to sort-merge if the
    flagged set ever outgrows the broadcast threshold.

    Documents whose text contains no non-empty line produce no output
    row (nothing to keep or drop). Duplicate lines WITHIN one document
    count once per occurrence in ``n_lines``/``chars_removed`` but all
    occurrences share the line's corpus-wide doc-frequency.

    The exploded-lines relation feeds BOTH the doc-frequency aggregate
    and the join-back side — two different distributions (lh vs doc),
    so AQE exchange reuse cannot dedup it (CLAUDE.md); it is persisted
    via :func:`register_cache` so the corpus scan + split + hash runs
    once, not twice.
    """
    lines = register_cache(
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("_l"))
        .select(F.col(id_col), F.trim(F.col("_l")).alias("_line"))
        .filter(F.col("_line") != "")
        .select(
            F.col(id_col),
            shingle_hash(F.col("_line")).alias("lh"),
            F.length(F.col("_line")).cast("bigint").alias("_len"),
        )
    )
    flagged = (
        lines.groupBy("lh")
        .agg(F.countDistinct(id_col).alias("line_df"))
        .filter(F.col("line_df") >= min_df)
        .select("lh", F.lit(1).alias("_boiler"))
    )
    boiler = F.col("_boiler").isNotNull().cast("bigint")
    return (
        lines.join(flagged, "lh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(boiler).alias("n_boilerplate"),
            (F.count(F.lit(1)) - F.sum(boiler)).alias("n_kept"),
            F.sum(F.col("_len") * boiler).alias("chars_removed"),
        )
    )


def line_dedup_scrub(
    df: DataFrame,
    min_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The REMOVAL half of :func:`line_dedup_stats` (CCNet applied):
    drop every boilerplate line (corpus doc-frequency >= ``min_df``)
    and re-assemble the surviving lines in original order, verified by
    md5 — a single mis-cut or re-ordered line diverges. Empty /
    whitespace-only lines are not content and are dropped on both
    engines; documents whose every line is boilerplate drop out.

    Same 100 TB shape as the stats query: the only joined relation is
    the small flagged-line set (anti-join on the 60-bit hash); the
    per-doc reassembly is one aggregation over the doc's own lines.
    As in :func:`line_dedup_stats`, the exploded-lines relation feeds
    both the flagged aggregate and the anti-join side, so it is
    persisted via :func:`register_cache` (one corpus scan, not two)."""
    lines = register_cache(
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "_l"),
        )
        .select(
            F.col(id_col),
            F.col("pos").cast("bigint").alias("pos"),
            F.trim(F.col("_l")).alias("line"),
        )
        .filter(F.col("line") != "")
        .withColumn("lh", shingle_hash(F.col("line")))
    )
    flagged = (
        lines.groupBy("lh")
        .agg(F.countDistinct(id_col).alias("line_df"))
        .filter(F.col("line_df") >= min_df)
        .select("lh")
    )
    kept = lines.join(flagged, "lh", "left_anti")
    ordered = F.array_sort(F.collect_list(F.struct("pos", "line")))
    return kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.md5(
            F.array_join(F.transform(ordered, lambda x: x["line"]), "\n")
        ).alias("clean_md5"),
    )


def shingle_arrays(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3,
    persist: bool = True,
) -> DataFrame:
    """``(_id, _shs: array<string>)`` — the materialization point of the
    dedup ladder. The Arrow-UDF shingle extraction is the expensive leaf
    of every similarity plan and is referenced by several branches
    (inverted index, set sizes, MinHash signatures, self-join sides), so
    it is ``persist()``-ed (lazy — populated on first evaluation,
    MEMORY_AND_DISK via default level) rather than recomputed per
    branch. At corpus scale this is the 'build the shingle index once'
    step a real pipeline would materialize anyway.

    Lifecycle: every persisted frame is registered; callers that run
    many queries in one long-lived session (parity gate, bench) call
    :func:`release_shingle_caches` after materializing a query so
    caches don't accumulate across queries."""
    out = df.select(
        F.col(id_col).alias("_id"),
        word_shingles_udf(k)(F.col(text_col)).alias("_shs"),
    )
    if persist:
        out = out.persist()
        _SHINGLE_CACHES.append(out)
    return out


_SHINGLE_CACHES: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` and enroll it in the query-scoped cache lifecycle
    (released by :func:`release_shingle_caches`, which the bench/parity
    harnesses call after each query). For any non-trivial subplan a
    query instantiates more than once — AQE exchange reuse is not
    reliable (CLAUDE.md), so multiply-referenced subplans must persist."""
    out = df.persist()
    _SHINGLE_CACHES.append(out)
    return out


def release_shingle_caches() -> int:
    """Unpersist every registered query-scoped cache (shingle arrays +
    anything enrolled via :func:`register_cache`) created since the
    last release; returns how many were dropped. Safe to call any time
    — consuming plans recompute from source if re-evaluated later."""
    n = len(_SHINGLE_CACHES)
    for df in _SHINGLE_CACHES:
        df.unpersist()
    _SHINGLE_CACHES.clear()
    return n


def _shingle_index(
    df: DataFrame, text_col: str, id_col: str, k: int, max_doc_freq: int | None
) -> DataFrame:
    """Exploded (id, shingle) inverted index with optional stop-shingle
    removal (doc-frequency cutoff — the scalability valve)."""
    return _index_from_arrays(shingle_arrays(df, text_col, id_col, k), max_doc_freq)


def _index_from_arrays(arr: DataFrame, max_doc_freq: int | None) -> DataFrame:
    ex = arr.select("_id", F.explode("_shs").alias("_sh"))
    if max_doc_freq is not None:
        freq = ex.groupBy("_sh").agg(F.count(F.lit(1)).alias("_df"))
        ex = ex.join(freq.filter(F.col("_df") <= max_doc_freq).select("_sh"), "_sh")
    return ex


def _sizes_from_arrays(arr: DataFrame, ex: DataFrame, max_doc_freq: int | None) -> DataFrame:
    """Per-doc shingle-set size. Without a doc-frequency cutoff it is
    ``size(_shs)`` straight off the cached arrays — no shuffle; with a
    cutoff it must count the post-filter index rows."""
    if max_doc_freq is None:
        return arr.select("_id", F.size("_shs").cast("bigint").alias("_n"))
    return ex.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Document pairs with k-word-shingle Jaccard >= threshold, via the
    inverted-index join (never an all-pairs scan). The threshold test is
    exact integer arithmetic: |A∩B| >= τ(|A|+|B|-|A∩B|) evaluated as
    100000·i >= τ·100000·(na+nb-i).

    SCALE WARNING — ``max_doc_freq=None`` (the uncut form) is
    test-scale-only: the self-join's work is Σ df(shingle)², which a
    Zipfian corpus turns quadratic on its head shingles. Production
    runs at corpus scale MUST either set ``max_doc_freq`` (the
    stop-shingle cutoff — changes the declared semantics to post-cut
    Jaccard, identically in the oracle) or use
    :func:`ngram_jaccard_pairs_prefix`, which returns EXACTLY the same
    pairs as the uncut form but prunes the join with the lossless
    prefix filter. ``minhash_lsh_pairs`` is the approximate route."""
    arr = shingle_arrays(df, text_col, id_col, k)
    if max_doc_freq is None:
        ex = _index_from_arrays(arr, None)
        sizes = _sizes_from_arrays(arr, ex, None)
        # singleton shingles (df=1, the vast majority in natural text)
        # can't match in the self-join — prune them first; sizes above
        # still count the full shingle sets, so Jaccard is unchanged
        shared = ex.groupBy("_sh").agg(F.count(F.lit(1)).alias("_df")).filter(
            F.col("_df") >= 2
        ).select("_sh")
        exs = ex.join(shared, "_sh")
    else:
        # Cutoff path: ONE df aggregation serves the cutoff filter, the
        # post-cut sizes, and the singleton prune; the filtered index is
        # persisted because FOUR consumers would otherwise re-run the
        # explode→freq→join chain (sizes, singleton freq, and both
        # self-join sides — AQE exchange reuse is not reliable here,
        # see CLAUDE.md).
        ex0 = arr.select("_id", F.explode("_shs").alias("_sh"))
        freq = ex0.groupBy("_sh").agg(F.count(F.lit(1)).alias("_df"))
        exd = register_cache(
            ex0.join(freq.filter(F.col("_df") <= max_doc_freq), "_sh")
        )
        sizes = exd.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
        exs = exd.filter(F.col("_df") >= 2).select("_id", "_sh")
    pairs = (
        exs.alias("a")
        .join(exs.alias("b"), (F.col("a._sh") == F.col("b._sh")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    tau_scaled = int(round(threshold * 100000))
    out = (
        pairs.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "n_b"), "id_b")
        .filter(
            F.col("n_common") * 100000
            >= F.lit(tau_scaled) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
    )
    return out.select(
        "id_a", "id_b", "n_common", "n_a", "n_b",
        (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias("jaccard"),
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    threshold: float,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard similarity join via PREFIX FILTERING — same result
    set as uncut :func:`ngram_jaccard_pairs` (the DuckDB oracle is the
    plain all-pairs Jaccard SQL, so the parity gate proves the filter
    lossless), but the candidate join is pruned to scale.

    The published All-Pairs/PPJoin idea (Chaudhuri et al. ICDE'06,
    Bayardo et al. WWW'07, Xiao et al. WWW'08): impose one global total
    order on shingles — ascending document frequency, ties by shingle —
    and index only each document's first ⌊(1−τ)·n⌋+1 shingles in that
    order (its *prefix*). Two documents with Jaccard ≥ τ must share at
    least one prefix shingle, so the equi-join over prefixes finds every
    qualifying pair; candidates are then verified exactly on the full
    shingle sets.

    Why this kills the Zipf head: the total order puts RARE shingles in
    prefixes, so a head shingle shared by millions of documents sits at
    the back of every document's ordering and never enters the index —
    candidate work concentrates on low-df shingles where df² is small.
    A ±length filter (τ·n_a ≤ n_b ≤ n_a/τ, both sides integer-scaled)
    prunes candidates further before verification. All threshold tests
    use the same exact integer arithmetic as the uncut form.

    Plan shape at 100 TB: one df aggregation, one per-doc top-(1−τ)n
    window (partitioned by doc — no global sort), one equi-join on
    prefix shingles, and an ``array_intersect`` verify on candidate
    pairs only."""
    tau = int(round(threshold * 100000))
    arr = shingle_arrays(df, text_col, id_col, k)
    # carry the set size through the explode — free, no sizes join and
    # no count-over-partition window
    ex = arr.select(
        "_id",
        F.size("_shs").cast("bigint").alias("_n"),
        F.explode("_shs").alias("_sh"),
    )
    freq = ex.groupBy("_sh").agg(F.count(F.lit(1)).alias("_df"))

    from pyspark.sql import Window

    w = Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("_sh").asc())
    # pos ≤ ⌊(1−τ)·n⌋ + 1  ⇔  (pos−1)·100000 ≤ (100000−τ)·n  (exact ints)
    pref = (
        ex.join(freq, "_sh")
        .withColumn("_pos", F.row_number().over(w))
        .filter(
            (F.col("_pos") - 1) * 100000 <= F.lit(100000 - tau) * F.col("_n")
        )
        .select("_id", "_sh", "_n", "_pos")
    )
    # the self-join below consumes this twice; without an explicit
    # persist the full explode→freq-join→window chain runs per side
    pref = register_cache(pref)
    # candidate pairs with the PPJoin POSITIONAL filter (Xiao et al.
    # WWW'08, exactly lossless): min position over a pair's shared
    # prefix shingles identifies the globally-FIRST shared shingle s*
    # (prefixes are order-downward-closed, so any earlier shared
    # shingle would itself be a candidate row), and every other shared
    # shingle follows s* in both docs — overlap ≤ 1 + min(n_a − pa*,
    # n_b − pb*). J ≥ τ needs overlap·(1+τ) ≥ τ·(n_a + n_b), so pairs
    # whose positional upper bound can't reach it are pruned BEFORE
    # their full shingle arrays are fetched and intersected — at
    # corpus scale the verify join is the wide part, and this is the
    # published all-pairs candidate-mass reducer.
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a._sh") == F.col("b._sh"))
            & (F.col("a._id") < F.col("b._id"))
            & (F.lit(tau) * F.col("a._n") <= F.lit(100000) * F.col("b._n"))
            & (F.lit(tau) * F.col("b._n") <= F.lit(100000) * F.col("a._n")),
        )
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
        )
        .agg(F.min("a._pos").alias("_pa"), F.min("b._pos").alias("_pb"))
        .filter(
            (1 + F.least(F.col("_na") - F.col("_pa"), F.col("_nb") - F.col("_pb")))
            * F.lit(100000 + tau)
            >= F.lit(tau) * (F.col("_na") + F.col("_nb"))
        )
        .select("id_a", "id_b")
    )
    ver = (
        cand.join(arr.select(F.col("_id").alias("id_a"), F.col("_shs").alias("_sa")), "id_a")
        .join(arr.select(F.col("_id").alias("id_b"), F.col("_shs").alias("_sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_sa", "_sb")).cast("bigint").alias("n_common"),
            F.size("_sa").cast("bigint").alias("n_a"),
            F.size("_sb").cast("bigint").alias("n_b"),
        )
        .filter(
            F.col("n_common") * 100000
            >= F.lit(tau) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
    )
    return ver.select(
        "id_a", "id_b", "n_common", "n_a", "n_b",
        (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias("jaccard"),
    )


def minhash_signature(
    df: DataFrame,
    n_hashes: int = 32,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    _arr: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document: sig[j] = min over shingles s of
    (a_j·h30(s) + b_j) mod (2^61−1). Computed by an Arrow-batched UDF
    straight off the (cached) shingle arrays — no 50×-larger explode
    relation, no 32-column hash aggregate; measured ~3× faster than the
    relational explode+agg form at sf0.1. Bit-identical to it: the same
    md5-fold (60 hex-bit prefix % 2^30) and the same int64 LCG
    arithmetic (a < 2^30, x < 2^30, b < 2^61 ⇒ a·x+b < 2^62, exact in
    int64 — the same bound the SQL oracle relies on); distinct shingles
    are hashed once per batch (memoized), mins vectorized in numpy.
    Docs with zero shingles are dropped, as the explode form did.
    Constants are reproducible from the seed (same in the oracle)."""
    import hashlib

    import numpy as np

    consts = _lcg_constants(n_hashes, seed)
    a_vec = np.array([a for a, _ in consts], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in consts], dtype=np.int64)[:, None]
    arr = _arr if _arr is not None else shingle_arrays(df, text_col, id_col, k)

    @F.pandas_udf("array<bigint>")
    def _sig(shs: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}
        out = []
        for doc in shs:
            if len(doc) == 0:
                # callers filter size(_shs) > 0 BEFORE this UDF (a
                # filter on the UDF output would make Catalyst evaluate
                # the UDF twice: once in the Filter, once in the
                # Project); the branch stays as a safety net only
                out.append(None)
                continue
            xs = np.empty(len(doc), dtype=np.int64)
            for i, s in enumerate(doc):
                x = memo.get(s)
                if x is None:
                    x = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % X_BITS
                    memo[s] = x
                xs[i] = x
            out.append(((a_vec * xs[None, :] + b_vec) % MERSENNE_61).min(axis=1))
        return pd.Series(out)

    sig = arr.filter(F.size("_shs") > 0).select(
        F.col("_id").alias(id_col), _sig(F.col("_shs")).alias("_hs")
    )
    return sig.select(
        id_col,
        *[F.element_at(F.col("_hs"), j + 1).alias(f"h{j}") for j in range(n_hashes)],
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band signatures → bucket equi-join →
    candidate pairs → exact Jaccard verification (>= threshold).

    bands·rows = n_hashes; a pair collides in a band iff all its rows
    match, so candidate generation is equi-joins only — the 100 TB path.
    Verification reuses the exact inverted-index Jaccard, restricted to
    candidates (semi-join), so output = (LSH recall) ∩ (true >= τ).
    """
    if n_hashes % bands != 0:  # fail fast, before any cache registers
        raise ValueError("bands must divide n_hashes")
    arr = shingle_arrays(df, text_col, id_col, k)
    cands = minhash_lsh_candidates(
        df, n_hashes, bands, k, text_col, id_col, seed, _arr=arr
    )
    return _jaccard_for_pairs(df, cands, threshold, k, text_col, id_col, max_doc_freq, _arr=arr)


def minhash_lsh_candidates(
    df: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    max_bucket: int | None = None,
    _arr: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs ``(id_a < id_b)`` from banded MinHash —
    the retrieval stage alone, shared by every verifier (exact Jaccard,
    Levenshtein, ...). Equi-joins only; never an all-pairs product.

    ``max_bucket`` is the hot-bucket valve (the analog of the Jaccard
    path's ``max_doc_freq``): a (band, bucket) group with ``b`` members
    emits b·(b−1)/2 pairs, so one degenerate bucket (boilerplate,
    near-empty docs) can dominate the verify stage; groups larger than
    ``max_bucket`` are dropped from retrieval. Choose it above the
    largest genuine near-dup family so it is a no-op until it matters.
    """
    if n_hashes % bands != 0:
        raise ValueError("bands must divide n_hashes")
    r = n_hashes // bands
    arr = _arr if _arr is not None else shingle_arrays(df, text_col, id_col, k)
    sig = minhash_signature(df, n_hashes, k, text_col, id_col, seed, _arr=arr)
    band_cols = [
        F.md5(F.concat_ws(",", *[F.col(f"h{b*r+j}") for j in range(r)])).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col).alias("_id"), *band_cols)
    stacked = banded.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    # the signature subplan (explode + 32-min aggregate + band md5s)
    # feeds both self-join sides — and, with the valve on, the sizes
    # aggregate and its join too (4 instantiations): pin one
    # materialization (AQE exchange reuse is not reliable, CLAUDE.md)
    stacked = register_cache(stacked)
    if max_bucket is not None:
        sizes = stacked.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        stacked = stacked.join(
            sizes.filter(F.col("_bsz") <= max_bucket).select("band", "bucket"),
            ["band", "bucket"],
        )
    return (
        stacked.alias("a")
        .join(
            stacked.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def minhash_levenshtein_pairs(
    df: DataFrame,
    max_dist_permille: int = 400,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Edit-distance-verified fuzzy dedup: banded-MinHash retrieval →
    JVM ``levenshtein`` on the candidate pairs only, kept when
    ``1000·dist <= max_dist_permille·max(len_a, len_b)`` — exact integer
    arithmetic on both engines (DuckDB has the same classic
    ``levenshtein``), so the oracle matches bit-for-bit.

    Cost model (be honest about it): per-pair work is O(len·T) via the
    threshold-banded levenshtein with T = permille·max_len/1000 — at
    the 400‰ default the band is still ~80% of the matrix, so this is
    candidate-COUNT-bound, not cheap per candidate (the 10× scale
    smoke grows ~15× on ~50× more qualifying pairs: output-bound, the
    correct shape, but a hot LSH bucket would hurt — that's what
    ``max_bucket`` caps). Lower ``max_dist_permille`` tightens both
    the semantic and the band width.
    """
    cands = minhash_lsh_candidates(
        df, n_hashes, bands, k, text_col, id_col, seed, max_bucket=max_bucket
    )
    txt = df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_txt"))
    joined = (
        cands.join(txt.withColumnRenamed("_tid", "id_a"), "id_a")
        .withColumnRenamed("_txt", "_ta")
        .join(txt.withColumnRenamed("_tid", "id_b"), "id_b")
        .withColumnRenamed("_txt", "_tb")
    )
    # The verify stage is CPU-dense (O(len·T) per pair) over BYTE-small
    # rows, so AQE's byte-based coalescing collapses it to one
    # partition and serializes all the Levenshtein work on one core
    # (measured 8× slower at sf0.1). Pin the verify parallelism with an
    # explicit repartition — a shuffle of candidate pairs is linear in
    # candidates and negligible next to the per-pair matrix work.
    n_part = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    joined = joined.repartition(n_part, "id_a", "id_b")
    # Banded levenshtein: pass the per-pair bound T = ⌊permille·max_len
    # / 1000⌋ as the threshold — Spark computes only a 2T+1-wide band
    # (O(n·T), not O(n·m)) and returns -1 above it. ``dist <= T`` ⟺
    # ``1000·dist <= permille·max_len`` for integers, so the kept pairs
    # and their exact distances are identical to the unbanded form (the
    # oracle computes the full distance and filters).
    thr = (
        f"CAST(({max_dist_permille} * greatest(length(_ta), length(_tb)))"
        " DIV 1000 AS INT)"
    )
    # Length-difference pre-filter: levenshtein(a,b) >= |len(a)-len(b)|,
    # so |len_a - len_b| > T cannot qualify — drop the pair BEFORE the
    # O(len·T) band computation. Exact (never prunes a qualifying
    # pair), and integer arithmetic on lengths, so the kept set is
    # unchanged; it only moves work off the hot UDF-free-but-quadratic
    # step for wildly length-mismatched LSH candidates.
    joined = joined.filter(F.expr(f"abs(length(_ta) - length(_tb)) <= {thr}"))
    out = joined.select(
        "id_a",
        "id_b",
        F.expr(f"levenshtein(_ta, _tb, {thr})").cast("bigint").alias("edit_dist"),
        F.greatest(F.length("_ta"), F.length("_tb")).cast("bigint").alias("max_len"),
    )
    return out.filter(F.col("edit_dist") >= 0)


def _jaccard_for_pairs(
    df: DataFrame,
    pairs: DataFrame,
    threshold: float,
    k: int,
    text_col: str,
    id_col: str,
    max_doc_freq: int | None = None,
    _arr: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard evaluated ONLY for the given candidate pairs.

    Instead of the full inverted-index self-join (all-pairs n_common,
    then intersect with candidates), each candidate pair is exploded by
    the left doc's shingles and matched against the right doc's — cost
    O(|candidates| · shingles/doc), independent of corpus pair count.
    Same output columns/values as :func:`ngram_jaccard_pairs` restricted
    to the pairs."""
    arr = _arr if _arr is not None else shingle_arrays(df, text_col, id_col, k)
    ex = _index_from_arrays(arr, max_doc_freq)
    if max_doc_freq is not None:
        # with a doc-frequency cutoff, ex carries a full-corpus
        # aggregation + join and feeds THREE consumers (a_sh, b_sh,
        # sizes) — persist it or the cutoff chain runs 3x (the same
        # reason ngram_jaccard_pairs register_cache's its exd chain)
        ex = register_cache(ex)
    sizes = _sizes_from_arrays(arr, ex, max_doc_freq)
    a_sh = ex.select(F.col("_id").alias("id_a"), "_sh")
    b_sh = ex.select(F.col("_id").alias("id_b"), "_sh")
    common = (
        pairs.join(a_sh, "id_a")
        .join(b_sh, ["id_b", "_sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    tau_scaled = int(round(threshold * 100000))
    out = (
        common.join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "n_b"), "id_b")
        .filter(
            F.col("n_common") * 100000
            >= F.lit(tau_scaled) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
    )
    return out.select(
        "id_a", "id_b", "n_common", "n_a", "n_b",
        (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).alias("jaccard"),
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    use_udf: bool = True,
) -> DataFrame:
    """60-bit SimHash over word tokens (term-frequency weighted): bit i
    of the fingerprint is the sign of Σ_tokens (2·bit_i(h(token)) − 1).

    Two bit-identical implementations:
    - ``use_udf=True`` (default): one Arrow-batched pandas UDF per doc —
      tokenize, hash unique tokens (hashlib md5 == Spark/DuckDB md5),
      one numpy bit-matrix reduction. Zero shuffle before the
      fingerprint exists; the relational form moves tokens×bits rows
      through an exchange (60× amplification) to compute the same 60
      integers per doc.
    - ``use_udf=False``: the relational explode(tokens)×explode(bits)
      form — the semantics anchor (mirrors the DuckDB oracle CTE), kept
      for the equivalence test and UDF-free contexts.

    Docs with zero tokens are absent from the output in both forms
    (explode of an empty array emits nothing)."""
    if use_udf:
        sh = simhash_udf(bits)
        # token-less docs are filtered on the UDF's INPUT — filtering
        # on its output made Catalyst evaluate the UDF twice (Filter
        # and Project each extract an ArrowEvalPython node; CLAUDE.md
        # rule, same shape as minhash_signature's input-side filter)
        src = df.filter(F.size(tokens(F.col(text_col))) > 0)
        return src.select(
            F.col(id_col),
            sh(F.col(text_col)).alias("simhash"),
        )
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("_tok"),
    ).withColumn("_h", shingle_hash(F.col("_tok")))
    bit = ex.select(
        "_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("_bit"),
        F.col("_h"),
    ).withColumn(
        "_sign",
        F.expr("(shiftright(_h, _bit) & 1) * 2 - 1"),
    )
    return (
        bit.groupBy("_id", "_bit")
        .agg(F.sum("_sign").alias("_s"))
        .withColumn(
            "_bitval",
            F.when(F.col("_s") > 0, F.expr("shiftleft(1L, _bit)")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .groupBy("_id")
        .agg(F.sum("_bitval").alias("simhash"))
        .withColumnRenamed("_id", id_col)
    )


def simhash_udf(bits: int = 60):
    """Arrow-batched SimHash: per doc, token frequencies × a ±1 bit
    matrix of the tokens' 60-bit md5 hashes, reduced with one numpy
    matmul-style sum. hashlib md5 == Spark/DuckDB ``md5``, and all
    arithmetic is integer, so fingerprints are bit-identical to the
    relational form. Returns NULL for token-less docs (dropped by the
    caller to match explode semantics). A per-batch token→hash memo
    exploits the shared vocabulary."""
    import hashlib

    import numpy as np

    tok_re = re.compile(r"[a-z0-9]+")
    bit_idx = np.arange(bits, dtype=np.uint64)

    @F.pandas_udf("bigint")
    def _sh(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def h60(tok: str) -> int:
            v = memo.get(tok)
            if v is None:
                v = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
                memo[tok] = v
            return v

        out = []
        for t in texts:
            toks = tok_re.findall(t.lower()) if t is not None else []
            if not toks:
                out.append(None)
                continue
            freq: dict[str, int] = {}
            for tok in toks:
                freq[tok] = freq.get(tok, 0) + 1
            hs = np.fromiter((h60(k) for k in freq), dtype=np.uint64, count=len(freq))
            ws = np.fromiter(freq.values(), dtype=np.int64, count=len(freq))
            signs = ((hs[:, None] >> bit_idx) & 1).astype(np.int64) * 2 - 1
            sums = (ws[:, None] * signs).sum(axis=0)
            fp = int(((sums > 0).astype(np.uint64) << bit_idx).sum())
            out.append(fp)
        return pd.Series(out, dtype="object")

    return _sh


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    bits: int = 60,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    Retrieval is *exact* by pigeonhole: with ``bands`` disjoint bit
    blocks and max_hamming < bands, any qualifying pair agrees on at
    least one block — so candidates come from equi-joins on block
    values, then the true hamming distance filters. No pairwise scan.
    """
    if max_hamming >= bands:
        raise ValueError("need max_hamming < bands for exact pigeonhole retrieval")
    width = bits // bands
    sh = simhash(df, text_col, id_col, bits)
    mask = (1 << width) - 1
    # the block list feeds BOTH sides of the candidate self-join —
    # persist it (register_cache lifecycle) or the SimHash UDF re-runs
    # over the corpus once per side (CLAUDE.md self-join rule; seen as
    # doubled ArrowEvalPython nodes in the former PLANS.md plan)
    blocks = register_cache(sh.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("blk"),
                    F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("val"),
                )
                for b in range(bands)
            ])
        ).alias("bv"),
    ).select("_id", "simhash", "bv.blk", "bv.val"))
    cands = (
        blocks.alias("a")
        .join(
            blocks.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    return cands.withColumn(
        "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def duplicate_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 8,
) -> DataFrame:
    """Connected components over a near-dup pair graph → (member,
    representative=min id in component). The step that turns pairwise
    dedup output into actual keep/drop decisions.

    Iterative min-label propagation with pointer jumping: each round
    takes the min label over neighbors, then jumps ``label ←
    label[label]`` — combined, convergence is ~log2(diameter), so
    ``iters=8`` covers any realistic near-dup cluster (diameter
    ≤ 2^8). Each round is two shuffles on bounded keys; no driver-side
    graph state — the standard large-scale CC shape.

    NOTE: eager — each round is ``localCheckpoint``-ed (the labels
    relation appears twice per round, so a lazy plan doubles every
    iteration), and iteration stops early once no label changes.
    Requires ``iters >= 1``: round 0 is what seeds the labels relation,
    so 0 rounds has no meaningful result to return.
    """
    if iters < 1:
        raise ValueError(f"duplicate_groups: iters must be >= 1, got {iters}")
    # Symmetrize AND self-loop with one explode, not a multi-branch
    # union: the pairs plan (often an expensive similarity join) must
    # be evaluated once. The (v, v) self-loops make every round a
    # single join+agg: min over {self ∪ neighbors} of the label IS
    # least(own label, neighbor min), and the self-loop row carries the
    # pre-round label out of the aggregation (as _l0) for the
    # convergence check — no separate label-merge join per round, and
    # round 0 needs no join at all (labels are the identity, so the
    # neighbor min is just min(u)).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("v"), F.col(id_b).alias("u")),
                    F.struct(F.col(id_b).alias("v"), F.col(id_a).alias("u")),
                    F.struct(F.col(id_a).alias("v"), F.col(id_a).alias("u")),
                    F.struct(F.col(id_b).alias("v"), F.col(id_b).alias("u")),
                )
            ).alias("_e")
        )
        .select("_e.v", "_e.u")
        .distinct()
        .localCheckpoint()
    )
    labels = None
    for rnd in range(iters):
        if rnd == 0:
            stepped = edges.groupBy("v").agg(
                F.min("u").alias("l"), F.max("v").alias("_l0")
            )
        else:
            stepped = (
                edges.join(labels.withColumnRenamed("v", "u"), "u")
                .groupBy("v")
                .agg(
                    F.min("l").alias("l"),
                    F.max(F.when(F.col("u") == F.col("v"), F.col("l"))).alias(
                        "_l0"
                    ),
                )
            )
        jump = stepped.select(F.col("v").alias("l"), F.col("l").alias("_jl"))
        stepped = (
            stepped.join(jump, "l", "left")
            .select("v", F.least(F.col("l"), F.coalesce("_jl", "l")).alias("l"),
                    "_l0")
            .localCheckpoint(eager=False)
        )
        # ONE job per round (r16, VERDICT r15 #8): the LAZY checkpoint
        # is materialized BY the convergence count — a full count (not
        # limit(1)) computes every partition of the checkpoint-marked
        # RDD (each is stored as it is computed) and returns the
        # changed-row count in the same job, replacing the eager
        # checkpoint job + separate limit(1) scan (2 jobs/round → 1).
        # Lineage truncation is unchanged — the frame wraps the
        # checkpointed RDD either way, so the doubling-plan hazard
        # stays fenced.
        changed = stepped.filter(F.col("l") != F.col("_l0")).count()
        labels = stepped.drop("_l0")
        if changed == 0:
            break
    return labels.select(
        F.col("v").alias("member"), F.col("l").alias("representative")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 16,
) -> DataFrame:
    """Embedding near-dup pairs: exact integer-scaled cosine >= τ.

    Elements are scaled to integers (×10^6) so dot products and norms
    are exact; the pair space is tiled into block pairs and each tile is
    one BLAS matmul (``similarity.blocked_allpairs_cosine`` — float64
    GEMM on integer values is exact below 2^53, so results match the
    bigint-fold DuckDB oracle bit-for-bit). At extreme scale route
    candidates through LSH buckets first and verify only those —
    :func:`embedding_lsh_pairs` is that route."""
    from lightsaber_spark.functions.similarity import blocked_allpairs_cosine

    return blocked_allpairs_cosine(df, threshold, id_col, vec_col, n_blocks)


def contamination_check(
    corpus: DataFrame,
    eval_set: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per corpus document, how many of its
    distinct k-word shingles appear in ANY eval-set document, plus the
    contaminated fraction — the standard pre-training hygiene check
    (drop or flag docs overlapping the eval benchmarks).

    Scale shape: the eval shingle set is small by definition →
    ``broadcast`` semi-side; the corpus is exploded once and hits are
    counted with one map-side-combinable aggregation. No self-join, no
    pair space. Documents with fewer than ``k`` tokens have no
    shingles and are absent from the output (mirrored by the oracle)."""
    # the corpus shingle frame feeds BOTH the explode branch and the
    # sizes branch (whose emptiness filter would otherwise double the
    # UDF again) — persist it, or the corpus shingle UDF runs 4x
    # (review finding, visible as four ArrowEvalPython nodes in the
    # former PLANS.md plan); the eval side is referenced once
    c = shingle_arrays(corpus, text_col, id_col, k, persist=True)
    e = shingle_arrays(eval_set, text_col, id_col, k, persist=False)
    eval_sh = e.select(F.explode("_shs").alias("_sh")).distinct()
    ex = c.select("_id", F.explode("_shs").alias("_sh"))
    sizes = c.select("_id", F.size("_shs").cast("bigint").alias("n_shingles")).filter(
        F.col("n_shingles") > 0
    )
    hits = ex.join(F.broadcast(eval_sh), "_sh").groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        sizes.join(hits, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_shingles",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint").alias("n_shared"),
            (
                F.coalesce(F.col("n_shared"), F.lit(0)) / F.col("n_shingles")
            ).alias("contamination"),
        )
    )


def embedding_lsh_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    bands: int = 4,
    dim: int = 64,
    salt: str = "nd",
) -> DataFrame:
    """LSH-prefiltered embedding near-dup pairs — the 100 TB route that
    replaces :func:`embedding_neardup_pairs`' O(n²) GEMM with a
    candidate equi-join (same structure as :func:`minhash_lsh_pairs`:
    band → bucket join → exact verification of candidates only).

    Each of ``bands`` independent random-hyperplane signatures
    (``n_planes`` md5-derived ±1 planes per band — deterministic, no
    stored plane matrix) is a bucket key; a pair is a candidate iff it
    collides in ≥1 band, and only candidates get the exact
    integer-scaled cosine (recall rises with ``bands``, candidate count
    with ``n_planes`` down). All signature work is one Arrow-batched
    matmul per band per batch; the join is a shuffle hash join on
    (band, sig) — linear shuffle volume, no pairwise scan.
    """
    from lightsaber_spark.functions.similarity import (
        _prep,
        _scaled_dot,
        hyperplane_band_signatures_udf,
    )

    # base feeds the signature branch AND both verify sides (va/vb);
    # sigs self-joins — persist both (register_cache lifecycle) or the
    # signature Arrow UDF runs once per join side and the scale+norm
    # fold four times (CLAUDE.md self-join rule; hyperplane_lsh_topk
    # already caches its _prep sides for exactly this reason)
    base = register_cache(_prep(df, id_col, vec_col, "_id"))
    # all bands in ONE Arrow UDF (single list→matrix conversion +
    # matmul per batch — see hyperplane_band_signatures_udf)
    sigs_udf = hyperplane_band_signatures_udf(
        n_planes, bands, dim, salt=salt, scaled=True
    )
    sigs = register_cache(
        base.select(
            "_id", F.posexplode(sigs_udf(F.col("_sv"))).alias("band", "sig")
        )
    )
    cands = (
        sigs.alias("a")
        .join(
            sigs.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    va = base.select(
        F.col("_id").alias("id_a"), F.col("_sv").alias("_va"), F.col("_norm").alias("_na")
    )
    vb = base.select(
        F.col("_id").alias("id_b"), F.col("_sv").alias("_vb"), F.col("_norm").alias("_nb")
    )
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine",
            _scaled_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def duplicated_passages(
    df: DataFrame,
    k: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated passages — the shingle-table form of
    exact-substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", 2021): any k-token run appearing in
    ``>= min_docs`` distinct documents is a duplicated passage.

    Returns ``(passage_hash, n_docs, min_doc_id)`` per duplicated
    k-shingle (60-bit md5 hash, so the DuckDB oracle reproduces it
    bit-for-bit; ``min_doc_id`` anchors a canonical occurrence).

    Scale shape: explode distinct per-doc k-shingles → ONE map-side-
    combinable aggregate on the shingle hash → HAVING. Work is linear
    in corpus tokens; the full suffix-array machinery of the paper is
    replaced by the fixed-k rolling window (standard at cluster
    scale). Downstream removal = semi-join docs against the passage
    table.
    """
    arr = shingle_arrays(df, text_col, id_col, k, persist=False)
    ex = arr.select("_id", F.explode("_shs").alias("_sh"))
    return (
        ex.groupBy(shingle_hash(F.col("_sh")).alias("passage_hash"))
        .agg(
            F.count_distinct("_id").cast("bigint").alias("n_docs"),
            F.min("_id").cast("bigint").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def passage_coverage_vs_index(
    docs: DataFrame,
    corpus_index: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache=None,
) -> DataFrame:
    """Per-document duplicated-passage coverage vs a FROZEN positional
    k-gram index ``(doc_id, pos, h)`` — the relational core shared by
    the batch ``passage_delta_vs_corpus`` query and the streaming
    ``foreachBatch`` scale path (r12). Output one row per input doc:
    ``(doc_id, n_tokens, n_dup_positions, n_covered, n_corpus_docs)``,
    zero-hit docs included with zeros.

    ``cache`` wraps the hit relation (delta×index collisions), which
    three aggregates consume — pass ``register_cache`` from a
    registered query, a plain ``lambda df: df.persist()`` from a
    caller that manages unpersist itself, or None to leave the plan
    uncached (three index scans)."""
    dsh = docs.select(
        F.col(id_col).cast("long").alias("d_doc"),
        F.posexplode(positional_shingles_udf(k)(F.col(text_col))).alias(
            "pos", "_sh"
        ),
    ).select(
        "d_doc",
        F.col("pos").cast("bigint").alias("d_pos"),
        shingle_hash(F.col("_sh")).alias("h"),
    )
    hit = corpus_index.join(dsh, "h").select(
        "d_doc",
        F.col("d_pos").alias("pos"),
        F.col("doc_id").alias("c_doc"),
    )
    if cache is not None:
        hit = cache(hit)
    dpos = hit.select("d_doc", "pos").distinct()
    ndup = dpos.groupBy(F.col("d_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_positions")
    )
    ncov = (
        dpos.select(
            "d_doc",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("cp"),
        )
        .distinct()
        .groupBy(F.col("d_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_covered"))
    )
    ncd = (
        hit.select("d_doc", "c_doc")
        .distinct()
        .groupBy(F.col("d_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus_docs"))
    )
    from lightsaber_spark.functions.text import token_count

    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    return (
        base.join(ndup, "doc_id", "left")
        .join(ncov, "doc_id", "left")
        .join(ncd, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_dup_positions"), F.lit(0))
            .cast("bigint").alias("n_dup_positions"),
            F.coalesce(F.col("n_covered"), F.lit(0))
            .cast("bigint").alias("n_covered"),
            F.coalesce(F.col("n_corpus_docs"), F.lit(0))
            .cast("bigint").alias("n_corpus_docs"),
        )
    )


def minhash_band_keys_udf(
    n_hashes: int = 32, bands: int = 8, k: int = 3, seed: int = 42
):
    """Per-ROW banded MinHash: array of ``bands`` md5 band keys,
    bit-identical to the relational path (:func:`minhash_signature` +
    the band md5 in :func:`minhash_lsh_candidates`) — same shingles,
    same h30, same LCG constants, same ``md5(concat_ws(','))`` band
    key. The per-row form needs NO aggregation, which is what lets the
    signature run on an unbounded STREAM (a streaming groupBy(_id)
    would itself be a stateful op); docs with zero shingles return an
    empty array (the relational path drops them in the explode)."""
    import hashlib

    if n_hashes % bands != 0:
        # same guard as minhash_lsh_candidates — a truncated r would
        # silently diverge from the relational signatures
        raise ValueError("bands must divide n_hashes")
    consts = _lcg_constants(n_hashes, seed)
    r = n_hashes // bands
    tok_re = re.compile(r"[a-z0-9]+")

    @F.pandas_udf("array<string>")
    def _bk(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = tok_re.findall(t.lower()) if t is not None else []
            shingles = dict.fromkeys(
                " ".join(toks[i : i + k])
                for i in range(max(len(toks) - (k - 1), 0))
            )
            if not shingles:
                out.append([])
                continue
            xs = [
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % X_BITS
                for s in shingles
            ]
            sig = [
                min((a * x + b) % MERSENNE_61 for x in xs) for a, b in consts
            ]
            out.append(
                [
                    hashlib.md5(
                        ",".join(str(sig[b * r + j]) for j in range(r)).encode()
                    ).hexdigest()
                    for b in range(bands)
                ]
            )
        return pd.Series(out)

    return _bk


def positional_shingles_udf(k: int = 10):
    """Arrow-batched POSITIONAL k-shingles — like
    :func:`word_shingles_udf` but keeping every occurrence in token
    order (no dedupe), so ``posexplode`` yields the shingle's token
    offset: the coverage unit of exact-substring dedup removal."""
    tok_re = re.compile(r"[a-z0-9]+")

    @F.pandas_udf("array<string>")
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = tok_re.findall(t.lower()) if t is not None else []
            out.append(
                [
                    " ".join(toks[i : i + k])
                    for i in range(max(len(toks) - (k - 1), 0))
                ]
            )
        return pd.Series(out)

    return _sh
