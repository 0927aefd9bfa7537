"""r12 review-fix guards: each of these used to crash at runtime or
silently corrupt/empty the result — now they raise (or behave) at
build time."""

import pytest
from pyspark.sql import functions as F


def test_row_window_slide_gt_size_raises(spark):
    from lightsaber_spark.operators.row_window import row_window_agg

    df = spark.range(10).select(F.col("id").alias("ts"))
    with pytest.raises(ValueError, match="hopping-with-gaps"):
        row_window_agg(df, ["ts"], 2, 5, [("count", None, "n")])


def test_theta_join_zero_band_raises(spark):
    from lightsaber_spark.operators.joins import theta_join

    l = spark.range(3).select(F.col("id").alias("l_ts"))
    r = spark.range(3).select(F.col("id").alias("r_ts"))
    with pytest.raises(ValueError, match="µs"):
        theta_join(l, r, None, "l_ts", "r_ts", max_delta_sec=0)
    with pytest.raises(ValueError, match="µs"):
        theta_join(l, r, None, "l_ts", "r_ts", max_delta_sec=4e-7)


def test_asof_join_internal_name_collision_raises(spark):
    from lightsaber_spark.operators import asof_join

    l = spark.createDataFrame([(1, 10, 99)], "k long, lts long, _t long")
    r = spark.createDataFrame([(1, 9, 5)], "k long, rts long, rv long")
    with pytest.raises(ValueError, match="internal"):
        asof_join(l, r, "lts", "rts", by=["k"])


def test_asof_broadcast_fractional_tolerance(spark):
    """0.5 s tolerance must match a 0.4-s-stale right row (int() used
    to floor it to 0 and only exact timestamps matched)."""
    from lightsaber_spark.operators.joins import asof_broadcast_join

    l = spark.createDataFrame([(1, 10.0)], "k long, lts double")
    r = spark.createDataFrame([(1, 9.6)], "k long, rts double")
    out = asof_broadcast_join(
        l, r, "lts", "rts", ["k"], tolerance_sec=0.5, out_col="m"
    ).collect()
    assert out[0].m == 9_600_000


def test_to_kafka_frame_empty_value_cols_raises(spark):
    from lightsaber_spark.sources.sinks import to_kafka_frame

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(ValueError, match="empty"):
        to_kafka_frame(df, key_col="k", value_cols=[])
    # None still means "all non-key columns"
    assert to_kafka_frame(df, key_col="k").columns == ["key", "value"]


def test_post_window_argmax_all_null_window_coverage(spark):
    """keep_ties and max_by modes must agree on group coverage when a
    window's values are all NULL (the == filter used to drop it)."""
    from lightsaber_spark.operators.topk import post_window_argmax

    df = spark.createDataFrame(
        [(0, "a", None), (0, "b", None), (3600, "a", 5)],
        "w long, k string, v int",
    )
    ties = post_window_argmax(df, ["w"], "k", "v", keep_ties=True)
    single = post_window_argmax(df, ["w"], "k", "v", keep_ties=False)
    assert {r.w for r in ties.collect()} == {r.w for r in single.collect()} == {0, 3600}


def test_bloom_null_key_build_and_probe(spark):
    """A NULL build key used to emit a (word=NULL) row that crashed
    bloom_probe's map_from_entries densify with NULL_MAP_KEY; a NULL
    probe key used to flag NULL instead of the contract's false."""
    from lightsaber_spark.functions.sketches import bloom_build, bloom_probe

    build = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    probe = spark.createDataFrame([("a",), (None,), ("z",)], "k string")
    bloom = bloom_build(build, "k", k=4, m_bits=1 << 10)
    got = {r.k: r.bloom_maybe for r in bloom_probe(
        probe, bloom, "k", k=4, m_bits=1 << 10
    ).collect()}
    assert got["a"] is True
    assert got[None] is False  # definitely absent, not NULL


def test_kmv_distinct_skips_nulls(spark):
    from lightsaber_spark.functions.sketches import kmv_distinct

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b")], "grp string, v string"
    )
    out = kmv_distinct(df, ["grp"], "v", k=8, out_col="n").collect()
    assert out[0].n == 2  # NULL is not a distinct value


def test_degenerate_sampling_oracles_parse(spark):
    """Empty rates / single-weight splits used to emit 'CASE ELSE x END'
    — a DuckDB parse error — while the Spark twins worked."""
    import duckdb

    from lightsaber_spark.functions.sampling import (
        mixture_oracle_pred,
        split_oracle_expr,
        upsample_oracle_parts,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 'x' AS id, 'web' AS src")
    for sql in (
        f"SELECT * FROM t WHERE {mixture_oracle_pred(['id'], {}, 'src', 0.5)}",
        f"SELECT {split_oracle_expr(['id'], [1.0])} FROM t",
        f"SELECT {upsample_oracle_parts(['id'], {}, 'src', 2.0)} FROM t",
    ):
        con.execute(sql)  # must parse and run


def test_upsample_oracle_null_key_zero_copies(spark):
    """A NULL-keyed row must get ZERO copies on BOTH engines (the
    _key_hash 'excluded in both engines' contract — the oracle's bare
    ELSE-0 branch used to emit floor(w) copies for it)."""
    import duckdb

    from lightsaber_spark.functions.sampling import (
        upsample_by_weight,
        upsample_oracle_parts,
    )

    df = spark.createDataFrame(
        [("x", "g"), (None, "g")], "id string, src string"
    )
    got = (
        upsample_by_weight(df, {"g": 2.0}, "src", ["id"])
        .groupBy("id").count().collect()
    )
    assert {r.id: r["count"] for r in got} == {"x": 2}
    con = duckdb.connect()
    n_expr = upsample_oracle_parts(["id"], {"g": 2.0}, "src")
    rows = con.execute(
        "WITH t(id, src) AS (VALUES ('x', 'g'), (NULL, 'g')) "
        f"SELECT id FROM (SELECT id, unnest(generate_series(0, {n_expr} - 1)) "
        "FROM t)"
    ).fetchall()
    assert [r[0] for r in rows] == ["x", "x"]


def test_stratified_sample_excludes_null_key_hashes(spark):
    """NULL key hashes are EXCLUDED on both engines (r13, the
    kmv/bottomk rule). Ordering them last was insufficient: when the
    rank cutoff falls INSIDE the NULL block (more slots than real
    rows), row_number tie-breaks the identical NULL hashes by physical
    partition order — different rows per engine/retry."""
    import duckdb

    from lightsaber_spark.functions.sampling import (
        stratified_oracle_sql,
        stratified_sample_exact,
    )

    # stratum L: cutoff straddles the NULL block (1 real row, n=2);
    # stratum M: cutoff before the block (2 real rows, n=2)
    rows = [
        ("L", "a"), ("L", None), ("L", None), ("L", None),
        ("M", "x"), ("M", "y"), ("M", None),
    ]
    df = spark.createDataFrame(rows, "lang string, doc string")
    got = sorted(
        (r.lang, r.doc)
        for r in stratified_sample_exact(df, 2, ["lang"], ["doc"]).collect()
    )
    assert got == [("L", "a"), ("M", "x"), ("M", "y")]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "('L', 'a'), ('L', NULL), ('L', NULL), ('L', NULL), "
        "('M', 'x'), ('M', 'y'), ('M', NULL)) v(lang, doc)"
    )
    want = sorted(
        (r[0], r[1])
        for r in con.execute(
            stratified_oracle_sql("t", 2, ["lang"], ["doc"], ["lang", "doc"])
        ).fetchall()
    )
    assert got == want


def test_banded_hamming_rejects_over_64_bits(spark):
    from lightsaber_spark.functions.hamming import banded_hamming_pairs

    sig = spark.createDataFrame([(1, 3)], "id long, h long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="64"):
        banded_hamming_pairs(sig, "id", "h", n_bits=128, n_bands=4, max_hamming=3)


def test_compression_plan_order_col_in_cols(spark):
    from lightsaber_spark.functions.compression import compression_plan

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(100)], "event_id long, t long"
    )
    out = compression_plan(df, ["event_id", "t"], "event_id").collect()
    assert {r.column_name for r in out} == {"event_id", "t"}
