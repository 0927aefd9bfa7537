"""Deterministic, cross-engine-checkable sketches.

Spark's built-in ``approx_count_distinct`` (HLL++) is the 100 TB
default, but its estimate is algorithm-specific — no external oracle
can reproduce it, so correctness checks degrade to rows-only. The
sketches here trade a little efficiency for **bit-exact cross-engine
reproducibility**: every randomized choice is derived from md5 of the
value (the repo's standard cross-engine hash, CLAUDE.md), so DuckDB
computes the *identical* estimate and the driver's value-hash compare
stays strong.

KMV (k-minimum-values) distinct estimator
-----------------------------------------
Keep the k smallest distinct 60-bit hashes per group; with h_(k) the
k-th smallest, estimate = (k−1)·2^60 / h_(k)  (Bar-Yossef et al. 2002;
Beyer et al. SIGMOD'07 unbiased form). If a group has < k distinct
hashes the sketch is exact. Standard error ≈ 1/√(k−2) (~3% at k=1024).

Scale note: the relational form below dedupes hashes (one map-side
combinable aggregation — the same shuffle exact distinct needs) and
then rank-filters to k per group; its win over exact distinct is the
bounded *output* and bounded downstream state, and the sketch column
can be unioned/merged across partitions of a table (min-merge is
associative). For a no-dedup-shuffle variant at extreme scale, fold the
k-min heap per partition with a pandas UDAF and merge — the estimator
and oracle stay identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from lightsaber_spark.functions.dedup import shingle_hash

TWO60 = 1 << 60


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 1024,
    out_col: str = "n_distinct_kmv",
) -> DataFrame:
    """Per-group KMV distinct-count estimate (exact below k).

    Returns ``(*group_cols, out_col: bigint)``. The estimate is
    computed in exact integer arithmetic — ``floor((k−1)·2^60 / h_k)``
    via decimal mod/div (no float), so DuckDB's HUGEINT ``//`` twin
    matches bit-for-bit.
    """
    groups = list(group_cols)
    # NULLs are not distinct values: unfiltered, the NULL hash ranks
    # NULLS FIRST here but NULLS LAST in DuckDB — it would consume a
    # bottom-k slot and shift _hk on one engine only (r12 review; the
    # oracle builder filters identically)
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, shingle_hash(F.col(value_col).cast("string")).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*groups).orderBy("_h") if groups else Window.orderBy("_h")
    ranked = d.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    # A = (k-1)·2^60 exceeds bigint → decimal(38,0); floor division done
    # as (A - A % h) / h, all exact decimal ops (CLAUDE.md lit gotcha)
    a_lit = F.expr(f"CAST('{(k - 1) * TWO60}' AS DECIMAL(38,0))")
    est = (
        ranked.groupBy(*groups)
        .agg(F.count(F.lit(1)).alias("_nk"), F.max("_h").alias("_hk"))
        .withColumn(
            out_col,
            F.when(F.col("_nk") < k, F.col("_nk").cast("bigint")).otherwise(
                ((a_lit - a_lit % F.col("_hk")) / F.col("_hk")).cast("bigint")
            ),
        )
        .select(*groups, out_col)
    )
    return est


def kmv_oracle_sql(
    table_expr: str,
    group_cols: Sequence[str],
    value_expr: str,
    k: int = 1024,
    out_col: str = "n_distinct_kmv",
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hash, same integer
    floor division via HUGEINT) for embedding in oracle queries."""
    groups = ", ".join(group_cols)
    part = f"PARTITION BY {groups} " if group_cols else ""
    a = (k - 1) * TWO60
    sel_groups = f"{groups}, " if group_cols else ""
    return f"""
    WITH _d AS (
      SELECT DISTINCT {sel_groups}('0x'||substr(md5(CAST({value_expr} AS VARCHAR)),1,15))::BIGINT AS _h
      FROM {table_expr} WHERE {value_expr} IS NOT NULL
    ),
    _r AS (
      SELECT {sel_groups}_h,
             row_number() OVER ({part}ORDER BY _h) AS _rn
      FROM _d
    )
    SELECT {sel_groups}
           CASE WHEN count(*) < {k} THEN count(*)
                ELSE (({a}::HUGEINT) // max(_h)::HUGEINT)::BIGINT
           END AS {out_col}
    FROM _r WHERE _rn <= {k}
    {"GROUP BY " + groups if group_cols else ""}
    """


# ---------------------------------------------------------------------------
# Bottom-k hash sample quantiles
# ---------------------------------------------------------------------------

def bottomk_sample_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
    k: int = 256,
    quantiles: Sequence[tuple[str, int, int]] = (
        ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100),
    ),
) -> DataFrame:
    """Per-group approximate quantiles from a deterministic bottom-k
    hash sample — the strong-checkable alternative to
    ``approx_percentile`` (whose t-digest no external oracle can
    reproduce).

    The k rows with the smallest 60-bit md5 hash of ``key_col`` form a
    uniform row sample per group (exact when the group has ≤ k rows);
    the bottom-k-by-hash selection is mergeable across partitions and
    engines. Quantile ``num/den`` is the sample's order statistic at
    0-based index ``floor(num·(n−1)/den)``, computed with INTEGER
    division — a float index would disagree between engines at exact
    multiples (e.g. 0.7·10). ``value_col`` should already be exact
    (integer cents).
    """
    groups = list(group_cols)
    # NULL value/key rows out on BOTH engines: a NULL _v or _h ranks
    # NULLS FIRST here vs NULLS LAST in DuckDB, shifting every order
    # statistic (r12 review; the oracle builder filters identically)
    h = df.filter(
        F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        *groups,
        F.col(value_col).alias("_v"),
        shingle_hash(F.col(key_col).cast("string")).alias("_h"),
    )
    wh = (
        Window.partitionBy(*groups).orderBy("_h")
        if groups else Window.orderBy("_h")
    )
    sample = h.withColumn("_rn", F.row_number().over(wh)).filter(
        F.col("_rn") <= k
    )
    wv = (
        Window.partitionBy(*groups).orderBy("_v", "_h")
        if groups else Window.orderBy("_v", "_h")
    )
    wn = (
        Window.partitionBy(*groups) if groups else Window.partitionBy(F.lit(1))
    )
    r = sample.select(
        *groups, "_v",
        F.row_number().over(wv).alias("_vr"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("_vr")
                == F.expr(f"({num} * (_n - 1)) div {den}") + 1,
                F.col("_v"),
            )
        ).alias(name)
        for name, num, den in quantiles
    ]
    return r.groupBy(*groups).agg(*aggs)


# ---------------------------------------------------------------------------
# Count-Min frequency sketch
# ---------------------------------------------------------------------------

def count_min_table(
    df: DataFrame,
    value_col: str,
    width: int = 256,
    depth: int = 4,
    salt: str = "cm",
) -> DataFrame:
    """Count-Min sketch table ``(d, b, cell)`` over ``value_col``
    frequencies (Cormode & Muthukrishnan '05): row ``d``'s bucket for
    value x is ``md5('{salt}{d}_' || x) % width``; a cell is the sum of
    counts hashing into it. Estimates (:func:`count_min_lookup`) are
    ``min`` over rows — always ≥ the true count, within εN with
    ε = e/width at confidence 1−(1/e)^depth.

    Scale shape: counts are pre-aggregated per distinct value first
    (one map-side-combinable shuffle — the sketch of a sum equals the
    sum of sketches), then the depth×width table is a TINY relation
    regardless of input size; md5 bucketing makes every cell bit-equal
    in the DuckDB oracle. Unlike exact top-k frequency, the table is
    mergeable across table partitions/days (cell-wise add)."""
    vc = df.groupBy(F.col(value_col).alias("_x")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    expanded = vc.select("_x", "_c", d).withColumn(
        "b",
        shingle_hash(
            F.concat(F.lit(salt), F.col("d").cast("string"), F.lit("_"),
                     F.col("_x").cast("string"))
        ) % width,
    )
    return expanded.groupBy("d", "b").agg(F.sum("_c").alias("cell"))


def count_min_lookup(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    width: int = 256,
    depth: int = 4,
    salt: str = "cm",
    out_col: str = "cm_count",
) -> DataFrame:
    """Point-frequency estimates from a :func:`count_min_table`:
    ``min`` cell across the ``depth`` rows for each queried value. The
    sketch is tiny → broadcast join; absent cells mean a true count of
    zero."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    qb = queries.select(F.col(value_col), d).withColumn(
        "b",
        shingle_hash(
            F.concat(F.lit(salt), F.col("d").cast("string"), F.lit("_"),
                     F.col(value_col).cast("string"))
        ) % width,
    )
    return (
        qb.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy(value_col)
        .agg(
            # min over coalesced cells, NOT coalesce over min: an
            # ABSENT cell is a true count of zero and must win the min
            # (review finding — min() skipped the NULLs from the left
            # join, so a never-seen value whose other buckets held
            # collision counts overestimated instead of returning 0)
            F.min(F.coalesce(F.col("cell"), F.lit(0)))
            .cast("bigint")
            .alias(out_col)
        )
    )


def count_min_oracle_sql(
    table_expr: str,
    value_expr: str,
    query_pred: str,
    width: int = 256,
    depth: int = 4,
    salt: str = "cm",
    out_col: str = "cm_count",
    value_name: str = "value",
) -> str:
    """DuckDB twin of sketch-build + lookup (same md5 buckets, same
    integer cell sums — bit-identical estimates)."""
    h = (
        f"('0x' || substr(md5('{salt}' || d || '_' || "
        f"CAST({{v}} AS VARCHAR)), 1, 15))::BIGINT % {width}"
    )
    return f"""
    WITH vc AS (SELECT {value_expr} AS _x, count(*) AS _c
                FROM {table_expr} GROUP BY 1),
    cells AS (SELECT d, {h.format(v='_x')} AS b, sum(_c) AS cell
              FROM vc, range({depth}) t(d) GROUP BY 1, 2),
    q AS (SELECT _x FROM vc WHERE {query_pred}),
    qb AS (SELECT _x, d, {h.format(v='_x')} AS b FROM q, range({depth}) t(d))
    SELECT qb._x AS {value_name},
           CAST(min(coalesce(cell, 0)) AS BIGINT) AS {out_col}
    FROM qb LEFT JOIN cells ON qb.d = cells.d AND qb.b = cells.b
    GROUP BY 1
    """


def bottomk_quantiles_oracle_sql(
    table_expr: str,
    group_cols: Sequence[str],
    value_expr: str,
    key_expr: str,
    k: int = 256,
    quantiles: Sequence[tuple[str, int, int]] = (
        ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100),
    ),
) -> str:
    """DuckDB twin of :func:`bottomk_sample_quantiles` (same hash, same
    rank arithmetic — bit-identical)."""
    groups = ", ".join(group_cols)
    part = f"PARTITION BY {groups}" if group_cols else ""
    sel = ",\n           ".join(
        f"max(CASE WHEN _vr = ({num} * (_n - 1)) // {den} + 1 "
        f"THEN _v END) AS {name}"
        for name, num, den in quantiles
    )
    return f"""
    WITH h AS (
      SELECT {groups}{"," if groups else ""} {value_expr} AS _v,
             ('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15))::BIGINT AS _h
      FROM {table_expr}
      WHERE {value_expr} IS NOT NULL AND {key_expr} IS NOT NULL
    ),
    s AS (SELECT * FROM (
            SELECT *, row_number() OVER ({part} ORDER BY _h) AS _rn FROM h)
          WHERE _rn <= {k}),
    r AS (SELECT {groups}{"," if groups else ""} _v,
                 row_number() OVER ({part} ORDER BY _v, _h) AS _vr,
                 count(*) OVER ({part if part else "PARTITION BY 1"}) AS _n
          FROM s)
    SELECT {groups}{"," if groups else ""}
           {sel}
    FROM r GROUP BY {groups if groups else "1"}
    """


# ---------------------------------------------------------------------------
# Bloom filter — broadcastable membership sketch for join prefiltering
# ---------------------------------------------------------------------------
# The 100 TB use: a multi-million-key build side compressed to m bits
# (a few-hundred-row word table) broadcast to every probe task — rows
# that cannot join are dropped BEFORE the shuffle. Spark's AQE has a
# runtime bloom-join under the hood; this is the explicit, composable
# operator form with a bit-exact DuckDB twin (md5-derived positions,
# so both engines build the identical bitmap — false positives and
# all).
#
# Bits are packed 60 per bigint word (not 64: 1<<63 overflows the
# signed range differently per engine; bit 0..59 masks stay positive
# and exact everywhere).

BLOOM_WORD_BITS = 60


def bloom_positions(key: Column, k: int, m_bits: int) -> Column:
    """Array of ``k`` bit positions for ``key`` from ONE md5: position
    ``i`` is a disjoint hex slice of md5(key) folded to bigint, mod m
    (for power-of-two ``m`` the slice is unbiased — 16^len is a
    multiple of m). One hash evaluation per key instead of k is the
    difference between a hash-bound and scan-bound build/probe at
    corpus scale. DuckDB twin:
    ``('0x'||substr(md5(CAST(x AS VARCHAR)), 1+i*len, len))::BIGINT % m``.

    Raises if the k slices don't fit md5's 32 hex chars: the DuckDB
    oracle twin (`_bloom_h` in queries.py) implements ONLY the shared
    slice path, so a silent fallback to a different hash family would
    break cross-engine parity without any test noticing."""
    hexlen = max(1, (max(m_bits - 1, 1).bit_length() + 3) // 4)
    if k * hexlen > 32:
        raise ValueError(
            f"bloom_positions: k={k} slices of {hexlen} hex chars "
            f"(m_bits={m_bits}) exceed md5's 32 hex chars; the DuckDB "
            "oracle twin has no fallback branch — reduce k or m_bits, "
            "or implement the salted fallback on BOTH engines first"
        )
    h = F.md5(key.cast("string"))
    return F.array(
        *[
            F.conv(F.substring(h, 1 + i * hexlen, hexlen), 16, 10).cast(
                "bigint"
            )
            % F.lit(m_bits)
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key_col: str, *, k: int = 4, m_bits: int = 1 << 14
) -> DataFrame:
    """Build the word table ``(word, bits)`` — ⌈m/60⌉ rows, one bigint
    OR-fold per word: map-side-combinable aggregate on a tiny key
    domain, output small enough to broadcast regardless of build-side
    row count."""
    pos = F.explode(
        bloom_positions(F.col(key_col), k, m_bits)
    ).alias("pos")
    # a NULL build key hashes to NULL positions → a (word=NULL) row
    # that crashes bloom_probe's map_from_entries densify with
    # NULL_MAP_KEY (r12 review, confirmed by execution) — and a NULL
    # was never a member anyway
    p = df.filter(F.col(key_col).isNotNull()).select(pos)
    # SQL DIV — same form as bloom_probe and the oracle's '//'
    # (CLAUDE.md: integer quotients never via /+cast)
    word = F.expr(f"pos DIV {BLOOM_WORD_BITS}")
    bit = (F.col("pos") % BLOOM_WORD_BITS).cast("int")
    return (
        p.select(word.alias("word"), bit.alias("bit"))
        # python shiftleft() only takes a literal shift — SQL form for
        # the column-valued bit index
        .select("word", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    k: int = 4,
    m_bits: int = 1 << 14,
    flag_col: str = "bloom_maybe",
) -> DataFrame:
    """Tag each probe row with ``flag_col`` = true iff ALL k bits are
    set (maybe-member; false = definitely absent).

    The sparse word table is first densified into a SINGLE row holding
    the whole bitmap as ``array<bigint>`` (⌈m/60⌉ elements — a few KB),
    which broadcasts to every probe task; the k membership checks are
    then unrolled per-row ``element_at``/bit-test expressions inside
    whole-stage codegen. No explode, no re-aggregation, and the probe
    side NEVER shuffles — the plan is scan → broadcast nested-loop of
    one row → filter-ready flag."""
    n_words = (m_bits + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS
    dense = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("_wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("bigint"), F.lit(n_words - 1).cast("bigint")),
            lambda i: F.coalesce(F.element_at(F.col("_wm"), i), F.lit(0).cast("bigint")),
        ).alias("_words")
    )
    out = df.crossJoin(F.broadcast(dense))
    key = F.col(key_col)
    out = out.withColumn("_ps", bloom_positions(key, k, m_bits))
    out = out.withColumns(
        {f"_p{i}": F.element_at(F.col("_ps"), i + 1) for i in range(k)}
    )
    conds = None
    for i in range(k):
        c = F.expr(
            f"element_at(_words, CAST(_p{i} DIV {BLOOM_WORD_BITS} AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % {BLOOM_WORD_BITS} AS INT))"
        ) != 0
        conds = c if conds is None else (conds & c)
    # NULL probe key → NULL positions → NULL conds: coalesce to false
    # ('definitely absent' — NULL keys are never inserted), matching
    # the DuckDB twin's coalesce(...,0) <> 0 form (r12 review)
    return out.select(*df.columns, F.coalesce(conds, F.lit(False)).alias(flag_col))


def kmv_intersection(
    df: DataFrame,
    set_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-intersection cardinality estimates from MERGED KMV
    sketches (Beyer et al. SIGMOD'07) — the sketch composition that
    makes KMV a join-planning tool: the union sketch of two sets is the
    bottom-k of their merged hashes (min-merge, associative), the
    Jaccard estimate is the fraction of those k hashes present in both
    sets, and |A∩B| ≈ m/k · |A∪B|-est.

    For every unordered pair of ``set_col`` values: ``(set_a, set_b,
    m_both, union_est, inter_est)`` — all exact integer arithmetic
    (the same decimal floor-division as :func:`kmv_distinct`, then
    ``m·union_est DIV k``), so the DuckDB twin is bit-identical.

    Scale shape: one distinct on (set, h) — the same shuffle the
    per-set sketch needs — then a tiny pairs×k relation; nothing
    pairwise ever touches raw rows.
    """
    # unordered pairs WITHOUT a join: fold the distinct sets into one
    # scalar array row, then explode twice — the quadratic fan-out
    # happens in Generate ops over a provably-one-row relation, so the
    # plan carries no nested-loop join at all
    sets_arr = df.agg(F.collect_set(F.col(set_col)).alias("_ss"))
    pairs = (
        sets_arr.select(F.explode("_ss").alias("set_a"), "_ss")
        .select("set_a", F.explode("_ss").alias("set_b"))
        .filter(F.col("set_a") < F.col("set_b"))
    )
    dh = (
        df.filter(F.col(value_col).isNotNull())  # same rule as kmv_distinct
        .select(
            F.col(set_col).alias("_s"),
            shingle_hash(F.col(value_col).cast("string")).alias("_h"),
        )
        .distinct()
    )
    # per (pair, hash): membership flags on each side. The pair list
    # is exploded to one row per (pair, member set) so the fan-out is a
    # broadcast HASH join on the set key — an OR-condition join would
    # plan as a nested loop
    pair_sides = pairs.select(
        "set_a",
        "set_b",
        F.explode(F.array(F.col("set_a"), F.col("set_b"))).alias("_s"),
    )
    ph = (
        F.broadcast(pair_sides)
        .join(dh, "_s")
        .groupBy("set_a", "set_b", "_h")
        .agg(
            F.max(F.when(F.col("_s") == F.col("set_a"), 1).otherwise(0)).alias("_ina"),
            F.max(F.when(F.col("_s") == F.col("set_b"), 1).otherwise(0)).alias("_inb"),
        )
    )
    w = Window.partitionBy("set_a", "set_b").orderBy("_h")
    bk = ph.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    a_lit = F.expr(f"CAST('{(k - 1) * TWO60}' AS DECIMAL(38,0))")
    agg = bk.groupBy("set_a", "set_b").agg(
        F.count(F.lit(1)).alias("_nk"),
        F.max("_h").alias("_hk"),
        F.sum(F.col("_ina") * F.col("_inb")).cast("bigint").alias("m_both"),
    )
    union_est = F.when(F.col("_nk") < k, F.col("_nk").cast("bigint")).otherwise(
        ((a_lit - a_lit % F.col("_hk")) / F.col("_hk")).cast("bigint")
    )
    return (
        agg.withColumn("union_est", union_est)
        .withColumn(
            "inter_est",
            # below-k sketches are EXACT: m_both IS the intersection
            F.when(F.col("_nk") < k, F.col("m_both")).otherwise(
                F.expr(f"CAST(m_both * union_est DIV {k} AS BIGINT)")
            ),
        )
        .select("set_a", "set_b", "m_both", "union_est", "inter_est")
    )


def kmv_intersection_oracle_sql(
    table_expr: str,
    set_expr: str,
    value_expr: str,
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`kmv_intersection`."""
    a = (k - 1) * TWO60
    return f"""
    WITH src AS (SELECT {set_expr} AS s, {value_expr} AS v FROM {table_expr}),
    sets AS (SELECT DISTINCT s FROM src),
    pairs AS (SELECT a.s AS set_a, b.s AS set_b
              FROM sets a JOIN sets b ON a.s < b.s),
    dh AS (SELECT DISTINCT s,
                  ('0x'||substr(md5(CAST(v AS VARCHAR)),1,15))::BIGINT AS h
           FROM src WHERE v IS NOT NULL),
    ph AS (SELECT set_a, set_b, h,
                  max(CASE WHEN s = set_a THEN 1 ELSE 0 END) AS ina,
                  max(CASE WHEN s = set_b THEN 1 ELSE 0 END) AS inb
           FROM pairs JOIN dh ON s = set_a OR s = set_b
           GROUP BY 1, 2, 3),
    bk AS (SELECT * FROM (
             SELECT *, row_number() OVER (PARTITION BY set_a, set_b ORDER BY h)
                       AS rn FROM ph)
           WHERE rn <= {k}),
    agg AS (SELECT set_a, set_b, count(*) AS nk, max(h) AS hk,
                   CAST(sum(ina * inb) AS BIGINT) AS m_both
            FROM bk GROUP BY 1, 2),
    u AS (SELECT *, CAST(CASE WHEN nk < {k} THEN nk
                    ELSE (({a}::HUGEINT) // hk::HUGEINT)::BIGINT END AS BIGINT)
                    AS union_est
          FROM agg)
    SELECT set_a, set_b, m_both, union_est,
           CAST(CASE WHEN nk < {k} THEN m_both
                ELSE m_both * union_est // {k} END AS BIGINT) AS inter_est
    FROM u
    """


def sliding_kmv_distinct(
    df: DataFrame,
    ts_col: str,
    size_sec: int,
    slide_sec: int,
    value_col: str,
    k: int = 64,
    out_col: str = "n_distinct_kmv",
) -> DataFrame:
    """Sliding-window distinct estimate via PANE-SKETCH MERGING — the
    composition that makes sliding distinct tractable: exact sliding
    distinct is not pane-decomposable (you cannot subtract a leaving
    pane's contribution), but the KMV sketch IS (min-merge): keep the
    bottom-k hashes per pane, fan panes out to their containing
    windows, and the bottom-k of the merged pane sketches EQUALS the
    bottom-k of the window's full value set — so the estimate is
    bit-identical to computing KMV per window from raw rows (which is
    exactly what the oracle does), while rows are touched once per
    PANE instead of once per window (size/slide× less).

    Requires ``slide | size`` (pane = slide). Returns
    ``(window_start, out_col)``.
    """
    if size_sec % slide_sec != 0:
        raise ValueError("slide must divide size for the pane decomposition")
    from lightsaber_spark.operators.window_agg import _exact_bucket, epoch_us

    ph = (
        df.filter(F.col(value_col).isNotNull())  # same rule as kmv_distinct
        .select(
            _exact_bucket(epoch_us(df, ts_col), slide_sec).alias("_p"),
            shingle_hash(F.col(value_col).cast("string")).alias("_h"),
        )
        .distinct()
    )
    wp = Window.partitionBy("_p").orderBy("_h")
    pk = ph.withColumn("_rn", F.row_number().over(wp)).filter(F.col("_rn") <= k)
    wins = pk.select(
        F.explode(
            F.sequence(
                F.col("_p") - F.lit(size_sec - slide_sec),
                F.col("_p"),
                F.lit(slide_sec),
            )
        ).alias("window_start"),
        "_h",
    ).distinct()
    ww = Window.partitionBy("window_start").orderBy("_h")
    bk = wins.withColumn("_rn", F.row_number().over(ww)).filter(F.col("_rn") <= k)
    a_lit = F.expr(f"CAST('{(k - 1) * TWO60}' AS DECIMAL(38,0))")
    return (
        bk.groupBy("window_start")
        .agg(F.count(F.lit(1)).alias("_nk"), F.max("_h").alias("_hk"))
        .withColumn(
            out_col,
            F.when(F.col("_nk") < k, F.col("_nk").cast("bigint")).otherwise(
                ((a_lit - a_lit % F.col("_hk")) / F.col("_hk")).cast("bigint")
            ),
        )
        .select("window_start", out_col)
    )
