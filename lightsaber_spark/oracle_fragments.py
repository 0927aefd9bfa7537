"""Shared DuckDB oracle SQL fragments — a LEAF module (no imports
back into the query catalogs), so both ``pipeline_queries`` and
``staged_queries`` can use them without forming an import cycle when
the staged registry is merged into the main one (round-5 ADVICE.md
item: a back-edge from staged_queries into pipeline_queries would let
a partially-populated staged dict be merged).

Cross-engine invariants these encode (CLAUDE.md exactness policy):
- tokenization = lowercase [a-z0-9]+ runs, identical regex semantics
  in Spark (`regexp_extract_all`) and DuckDB;
- 3-gram word shingles, space-joined, de-duplicated;
- 60-bit hashing = md5-hex-prefix folded to BIGINT — bit-identical on
  both engines and below 2^63 so no HUGEINT appears.
"""

# NULL text yields an EMPTY token list, never NULL — the DuckDB twin
# of functions/text.tokens()'s coalesce (r13: without it, Spark's
# size(NULL) = -1 and DuckDB's len(NULL) = NULL silently diverged on
# null-text corpora; every TOKS consumer inherits the fix)
TOKS = (
    "COALESCE(regexp_extract_all(lower(text), '[a-z0-9]+'), "
    "CAST([] AS VARCHAR[]))"
)
SHINGLES = (
    "list_distinct(list_transform(range(greatest(len(t) - 2, 0)), "
    "i -> array_to_string(t[i+1:i+3], ' ')))"
)
H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"


def minhash_sig_parts(n_hashes: int = 32, bands: int = 8, seed: int = 42):
    """``(consts, r, mins, band_cols, stacked)`` — the shared SQL
    fragments of the MinHash signature recipe (LCG permutations over
    the 60-bit shingle hash folded to X_BITS, per-band md5 keys, the
    band/bucket unpivot). SINGLE-SOURCED here because five oracles
    (minhash LSH, minhash+Levenshtein, delta-vs-corpus, data card,
    calibration) used to regenerate these ~15 lines verbatim — any
    tweak to the recipe (seed, band separator, fold) had to be
    replicated five times or one oracle silently drifted from
    ``minhash_band_keys_udf`` (review finding; the ``_LINE_AUG_SQL``
    comment states the same single-sourcing rule). Imported lazily to
    keep this module import-cycle-free."""
    from lightsaber_spark.functions.dedup import MERSENNE_61, _lcg_constants

    consts = _lcg_constants(n_hashes, seed)
    r = n_hashes // bands
    mins = ",\n           ".join(
        f"min(({a} * x + {b}) % {MERSENNE_61}) AS h{j}"
        for j, (a, b) in enumerate(consts)
    )
    band_cols = ",\n           ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"h{b * r + j}" for j in range(r))
        + f")) AS band{b}"
        for b in range(bands)
    )
    stacked = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, band{b} AS bucket FROM banded"
        for b in range(bands)
    )
    return consts, r, mins, band_cols, stacked
