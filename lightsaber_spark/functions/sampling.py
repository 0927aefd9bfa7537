"""Deterministic sampling & dataset splitting for training pipelines.

``df.sample()`` is seed-dependent *per partitioning* (a repartition or
retry changes the sample), which is unacceptable for reproducible
training data. Everything here derives the keep/route decision from
md5 of a stable row key — the repo's cross-engine hash — so:

- the sample is a pure function of the data (stable under partitioning,
  retries, engine version, and engine itself: DuckDB twins match
  bit-for-bit);
- re-runs over grown data keep previously-selected rows selected
  (append-only corpora get consistent incremental samples);
- at 100 TB it is one embarrassingly-parallel filter — no shuffle, no
  state, pushed right above the scan.

The uniformity argument is the usual one: md5 is uniform on [0, 2^60)
over distinct keys, so ``hash < rate·2^60`` keeps each key with
probability ``rate`` (exactly the expected fraction in distribution,
not exactly ``rate·n`` rows — use rank-based selection when an exact
count is required).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from lightsaber_spark.functions.dedup import shingle_hash

TWO60 = 1 << 60


def _case_or_lit(when_arms: Sequence[str], else_val) -> str:
    """`CASE <arms> ELSE v END`, or the bare `v` literal when there are
    NO arms — `CASE ELSE v END` is a DuckDB parse error, so an empty
    rates/weights dict or a 1-way split built a Spark plan that worked
    against an oracle that could not parse (r12 review, confirmed)."""
    if not when_arms:
        return str(else_val)
    return f"CASE {' '.join(when_arms)} ELSE {else_val} END"


def _key_hash(key_cols: Sequence[str], salt: str) -> Column:
    """60-bit md5 hash of the salted, ','-joined key columns.
    DuckDB twin: ``('0x'||substr(md5(<salt>||','||cols...),1,15))::BIGINT``.

    NULL-propagating ``concat`` on purpose, matching the twin's ``||``:
    a NULL key column yields a NULL hash, so every numeric predicate on
    it is NULL and the row is excluded in BOTH engines (review finding
    — ``concat_ws`` silently SKIPPED null columns, diverging from the
    oracle on nullable keys and aliasing ('a', NULL, 'b') with
    ('a', 'b'))."""
    parts: list[Column] = [F.lit(salt)]
    for c in key_cols:
        parts.extend((F.lit(","), F.col(c).cast("string")))
    return shingle_hash(F.concat(*parts))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_cols: Sequence[str],
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~``rate`` sample: keep rows whose key hash falls in
    the first ``rate`` fraction of hash space. Same keys always sample
    together (e.g. key on user_id → per-user all-or-nothing, the
    leakage-safe grouping for train/eval splits)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    threshold = int(round(rate * TWO60))
    return df.filter(_key_hash(key_cols, salt) < F.lit(threshold))


def hash_split(
    df: DataFrame,
    weights: Sequence[float],
    key_cols: Sequence[str],
    salt: str = "split",
    split_col: str = "split_id",
) -> DataFrame:
    """Deterministic n-way split: adds ``split_col`` in [0, len(weights))
    routing each row by key hash, with fractions ~``weights`` (must sum
    to 1). The standard train/val/test split — keyed, so all rows of a
    key land in one split (no leakage across splits)."""
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1")
    h = _key_hash(key_cols, salt)
    # cumulative integer thresholds — exact, no float boundary ambiguity
    cum, bounds = 0.0, []
    for w in weights[:-1]:
        cum += w
        bounds.append(int(round(cum * TWO60)))
    expr = F.lit(len(weights) - 1)
    for i in range(len(bounds) - 1, -1, -1):
        expr = F.when(h < F.lit(bounds[i]), F.lit(i)).otherwise(expr)
    return df.withColumn(split_col, expr.cast("int"))


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str,
    key_cols: Sequence[str],
    default_rate: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Dataset-mixture sampling: keep each row with its group's rate —
    the deterministic re-weighting step that turns raw source corpora
    into a training mixture (e.g. wiki ×0.5, web ×0.05). Same md5-hash
    keep rule as :func:`hash_sample`, so the mixture is partition- and
    retry-stable and each group's sample is a superset of any
    lower-rate sample of the same group (rates can be tuned without
    resampling unrelated rows). Groups not in ``rates`` fall back to
    ``default_rate``. One shuffle-free filter at any scale."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1]")
    h = _key_hash(key_cols, salt)
    thr = F.lit(int(round(default_rate * TWO60)))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(int(round(r * TWO60)))).otherwise(thr)
    return df.filter(h < thr)


def upsample_by_weight(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str,
    key_cols: Sequence[str],
    default_weight: float = 1.0,
    salt: str = "upsample",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Mixture weights ABOVE 1: repeat each row ``⌊w⌋`` or ``⌈w⌉`` times
    so the expected multiplicity is exactly its group's weight — the
    oversampling half of mixture construction (e.g. wiki ×2.5, books
    ×1.2, web ×0.3 in one pass; weights < 1 degenerate to
    :func:`mixture_sample` semantics with the same hash rule).

    Every emitted copy carries ``epoch_col`` ∈ [0, n) so downstream
    shuffling/packing can separate epochs. The fractional extra copy is
    keyed on the md5 hash (partition-/retry-stable, monotone in w: a
    weight bump never drops a previously-emitted copy).

    Scale: a map-side ``explode`` — rows multiply in place, no shuffle,
    no skew added beyond the intended multiplicity."""
    import math

    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {g!r} must be >= 0")
    if default_weight < 0:
        raise ValueError("default_weight must be >= 0")

    def _parts(w: float) -> tuple[int, int]:
        base = math.floor(w)
        return int(base), int(round((w - base) * TWO60))

    h = _key_hash(key_cols, salt)
    db, df_thr = _parts(default_weight)
    nb: Column = F.lit(db)
    fr: Column = F.lit(df_thr)
    for g, w in sorted(weights.items()):
        wb, wf = _parts(w)
        nb = F.when(F.col(group_col) == g, F.lit(wb)).otherwise(nb)
        fr = F.when(F.col(group_col) == g, F.lit(wf)).otherwise(fr)
    n = (nb + (h < fr).cast("int")).cast("bigint")
    seq = F.when(
        n >= 1, F.sequence(F.lit(0).cast("bigint"), n - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    return df.withColumn(epoch_col, F.explode(seq))


def upsample_oracle_parts(
    key_exprs: Sequence[str],
    weights: dict[str, float],
    group_col: str,
    default_weight: float = 1.0,
    salt: str = "upsample",
) -> str:
    """DuckDB twin of :func:`upsample_by_weight`'s copy count ``n`` as a
    SQL expression (pair with ``unnest(generate_series(0, n - 1))``)."""
    import math

    joined = " || ',' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    h = f"('0x'||substr(md5('{salt}' || ',' || {joined}),1,15))::BIGINT"

    def _parts(w: float) -> tuple[int, int]:
        base = math.floor(w)
        return int(base), int(round((w - base) * TWO60))

    db, dfr = _parts(default_weight)
    nb_cases = _case_or_lit(
        [
            f"WHEN {group_col} = '{g}' THEN {_parts(w)[0]}"
            for g, w in sorted(weights.items())
        ],
        db,
    )
    fr_cases = _case_or_lit(
        [
            f"WHEN {group_col} = '{g}' THEN {_parts(w)[1]}"
            for g, w in sorted(weights.items())
        ],
        dfr,
    )
    # NULL hash => ZERO copies, matching the engine (its empty-sequence
    # branch), not the bare CASE's ELSE-0 which still emitted ⌊w⌋
    # copies for a NULL-keyed row (r12 review, confirmed by execution —
    # the _key_hash contract is 'excluded in BOTH engines')
    return (
        f"(CASE WHEN {h} IS NULL THEN 0 ELSE {nb_cases}"
        f" + CASE WHEN {h} < ({fr_cases})"
        f" THEN 1 ELSE 0 END END)"
    )


def mixture_oracle_pred(
    key_exprs: Sequence[str],
    rates: dict[str, float],
    group_col: str,
    default_rate: float = 0.0,
    salt: str = "mix",
) -> str:
    """DuckDB WHERE-clause twin of :func:`mixture_sample`."""
    joined = " || ',' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    h = f"('0x'||substr(md5('{salt}' || ',' || {joined}),1,15))::BIGINT"
    cases = _case_or_lit(
        [
            f"WHEN {group_col} = '{g}' THEN {int(round(r * TWO60))}"
            for g, r in sorted(rates.items())
        ],
        int(round(default_rate * TWO60)),
    )
    return f"{h} < ({cases})"


def stratified_sample_exact(
    df: DataFrame,
    n_per_stratum: int,
    strata_cols: Sequence[str],
    key_cols: Sequence[str],
    salt: str = "strata",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen as the n smallest key hashes — deterministic,
    partition-stable, and still uniform within each stratum.

    This is the exact-count companion to :func:`hash_sample` (which is
    exact-in-distribution only): eval/test-set construction usually
    wants "exactly 1000 docs per language", not "about 0.1%".

    One shuffle (rank within stratum); ties impossible modulo md5
    collisions on the full key, which both engines would share.

    CONTRACT: ``key_cols`` must be row-unique within each stratum (the
    catalog keys on doc_id). Duplicate keys share a hash, and
    ``row_number`` then breaks the tie by physical partition order —
    selection at the boundary rank would differ between retries and
    from the oracle (whose ORDER BY has the same tie). The determinism
    claim above is conditional on that uniqueness.
    """
    from pyspark.sql import Window

    strata = list(strata_cols)
    # NULL key hashes are EXCLUDED on both engines (the kmv/bottomk
    # rule): every NULL-keyed row shares the single NULL _sh, so any
    # ordering policy only moves the block — when the rank cutoff
    # falls inside it, row_number tie-breaks by physical partition
    # order and selection differs per engine/retry (r12 ADVICE; the
    # earlier asc_nulls_last fix was insufficient for exactly that
    # boundary case)
    w = Window.partitionBy(*strata).orderBy(F.col("_sh").asc())
    return (
        df.withColumn("_sh", _key_hash(key_cols, salt))
        .filter(F.col("_sh").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_sh", "_rn")
    )


def stratified_oracle_sql(
    table_expr: str,
    n_per_stratum: int,
    strata_cols: Sequence[str],
    key_exprs: Sequence[str],
    select_cols: Sequence[str],
    salt: str = "strata",
) -> str:
    """DuckDB twin of :func:`stratified_sample_exact` (same hash, same
    rank-within-stratum selection, same NULL-key-hash exclusion)."""
    joined = " || ',' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    h = f"('0x'||substr(md5('{salt}' || ',' || {joined}),1,15))::BIGINT"
    part = ", ".join(strata_cols)
    sel = ", ".join(select_cols)
    return f"""
    SELECT {sel} FROM (
      SELECT *, row_number() OVER (PARTITION BY {part} ORDER BY {h}) AS _rn
      FROM {table_expr} WHERE {h} IS NOT NULL
    ) t WHERE _rn <= {n_per_stratum}
    """


def sample_oracle_pred(key_exprs: Sequence[str], rate: float, salt: str = "sample") -> str:
    """DuckDB WHERE-clause twin of :func:`hash_sample`'s filter."""
    threshold = int(round(rate * TWO60))
    joined = " || ',' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    return (
        f"('0x'||substr(md5('{salt}' || ',' || {joined}),1,15))::BIGINT"
        f" < {threshold}"
    )


def split_oracle_expr(
    key_exprs: Sequence[str], weights: Sequence[float], salt: str = "split"
) -> str:
    """DuckDB CASE-expression twin of :func:`hash_split`'s routing."""
    joined = " || ',' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    h = f"('0x'||substr(md5('{salt}' || ',' || {joined}),1,15))::BIGINT"
    cum, cases = 0.0, []
    for i, w in enumerate(weights[:-1]):
        cum += w
        cases.append(f"WHEN {h} < {int(round(cum * (1 << 60)))} THEN {i}")
    return _case_or_lit(cases, len(weights) - 1)
