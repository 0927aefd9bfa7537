"""Property-based check of the pane-decomposed sliding aggregation.

The pane path (`_sliding_panes`, the reference's gcd-slicing trick
expressed as two Catalyst aggregations) must produce EXACTLY the rows
of the naive per-row-expansion path for every (size, slide) — this is
the invariant the reference's whole design rests on
(``WindowDefinition.h:80-90``: every window is a union of whole panes).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from tests.conftest import rows_match

from lightsaber_spark.operators import windowed_agg

AGGS = [
    ("sum", "value", "s"),
    ("count", None, "n"),
    ("min", "value", "mn"),
    ("max", "value", "mx"),
    ("avg", "value", "av"),
]


@settings(max_examples=12, deadline=None)
@given(
    slide=st.integers(min_value=1, max_value=40).map(lambda x: x * 60),
    ratio=st.integers(min_value=2, max_value=12),
    grouped=st.booleans(),
)
def test_pane_path_equals_naive_path(spark_session_holder, slide, ratio, grouped):
    spark, events = spark_session_holder
    size = slide * ratio
    keys = ["event_type"] if grouped else []
    pane = windowed_agg(events, "ts", size, slide, AGGS, keys, use_panes=True)
    naive = windowed_agg(events, "ts", size, slide, AGGS, keys, use_panes=False)
    ok, msg = rows_match(pane.collect(), naive.collect(), float_tol=1e-9)
    assert ok, f"size={size} slide={slide} grouped={grouped}: {msg}"


import pytest


@pytest.fixture(scope="module")
def spark_session_holder(spark, events):
    # hypothesis can't take function-scoped fixtures; bundle session-scoped
    return spark, events.cache()


def test_prefix_path_equals_pane_path(spark, events):
    """The prefix-sum path (subtract-on-evict relationally) must equal
    the pane path exactly — integer inputs make both orders exact."""
    from pyspark.sql import functions as F

    ev = events.withColumn("vc", F.round(F.col("value") * 100).cast("bigint"))
    aggs = [("sum", "vc", "s"), ("count", None, "n"), ("avg", "vc", "a")]
    pre = windowed_agg(ev, "ts", 3600, 60, aggs, use_prefix=True)
    pane = windowed_agg(ev, "ts", 3600, 60, aggs, use_prefix=False, use_panes=True)
    ok, msg = rows_match(pre.collect(), pane.collect(), float_tol=1e-9)
    assert ok, msg


@settings(max_examples=8, deadline=None)
@given(delta=st.integers(min_value=30, max_value=7200))
def test_theta_band_bucketing_equals_naive(spark_session_holder, delta):
    """The bucketed band equi-join must produce exactly the pairs of a
    naive cross-join + band filter for any max_delta — boundary rows
    (|Δt| == delta) and bucket-edge rows included."""
    from pyspark.sql import functions as F

    from lightsaber_spark.operators import theta_join

    spark, events = spark_session_holder
    l = events.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("lid"), F.col("ts").alias("l_ts")
    )
    r = events.filter(F.col("event_id") % 89 == 0).select(
        F.col("event_id").alias("rid"), F.col("ts").alias("r_ts")
    )
    got = theta_join(l, r, None, "l_ts", "r_ts", max_delta_sec=delta).select("lid", "rid")

    lt = F.col("l_ts").cast("double")
    rt = F.col("r_ts").cast("double")
    want = l.crossJoin(r).filter(
        (rt >= lt - delta) & (rt <= lt + delta)
    ).select("lid", "rid")
    ok, msg = rows_match(got.collect(), want.collect())
    assert ok, f"delta={delta}: {msg}"


def test_prefix_chunked_carry_equals_pane_path(spark, events):
    """The chunk-parallel prefix path with tiny chunks (forcing many
    chunk boundaries and carry rows) must equal the pane path exactly —
    the carry trick (each chunk prepends the previous chunk's last k
    panes so cum − lag(k) stays exact per partition) is invisible at
    default chunk size on test-scale spines."""
    from pyspark.sql import functions as F

    ev = events.withColumn("vc", F.round(F.col("value") * 100).cast("bigint"))
    aggs = [("sum", "vc", "s"), ("count", None, "n"), ("avg", "vc", "a")]
    # k = 60 panes per window; 64-pane chunks → carries cross every chunk
    pre = windowed_agg(
        ev, "ts", 3600, 60, aggs, use_prefix=True, prefix_panes_per_chunk=64
    )
    pane = windowed_agg(ev, "ts", 3600, 60, aggs, use_prefix=False, use_panes=True)
    ok, msg = rows_match(pre.collect(), pane.collect(), float_tol=1e-9)
    assert ok, msg


@settings(max_examples=6, deadline=None)
@given(n_salts=st.integers(min_value=1, max_value=32))
def test_salted_join_equals_plain_join(spark_session_holder, n_salts):
    """Salting only changes partitioning: for any salt count the result
    must be exactly the plain equi join, hot keys included."""
    from pyspark.sql import functions as F

    from lightsaber_spark.operators import salted_join

    spark, events = spark_session_holder
    # heavy skew: ~75% of rows share key 1
    l = events.select(
        F.when(F.col("user_id") % 4 > 0, F.lit(1))
        .otherwise(F.col("user_id"))
        .cast("bigint")
        .alias("k"),
        "event_id",
    )
    r = events.select(F.col("user_id").cast("bigint").alias("k"), "event_type").distinct()
    got = salted_join(l, r, "k", n_salts=n_salts)
    want = l.join(r, "k")
    ok, msg = rows_match(got.select("k", "event_id", "event_type").collect(),
                         want.select("k", "event_id", "event_type").collect())
    assert ok, f"n_salts={n_salts}: {msg}"


def test_prefix_path_rejects_grouped(spark, events):
    with pytest.raises(ValueError):
        windowed_agg(
            events, "ts", 3600, 60, [("count", None, "n")], ["event_type"],
            use_prefix=True,
        )


def test_prefix_path_minmax_equals_pane_path(spark, events):
    """The van Herk block-decomposed MIN/MAX on the prefix path (the
    reference's AggregationTree non-invertible sliding, relationally)
    must equal the pane path exactly, mixed with invertible aggs in the
    same call."""
    from pyspark.sql import functions as F

    ev = events.withColumn("vc", F.round(F.col("value") * 100).cast("bigint"))
    aggs = [
        ("max", "vc", "mx"),
        ("min", "vc", "mn"),
        ("count", None, "n"),
        ("sum", "vc", "s"),
    ]
    pre = windowed_agg(ev, "ts", 3600, 60, aggs, use_prefix=True)
    pane = windowed_agg(ev, "ts", 3600, 60, aggs, use_prefix=False, use_panes=True)
    ok, msg = rows_match(pre.collect(), pane.collect(), float_tol=1e-9)
    assert ok, msg


def test_prefix_path_minmax_small_chunks(spark, events):
    """Chunk-parallelism must not change results: tiny chunks force many
    carry blocks (chunk size rounds up to a multiple of k, carries are
    whole blocks), including clipped leading windows at the aligned
    spine start."""
    from pyspark.sql import functions as F

    ev = events.withColumn("vc", F.round(F.col("value") * 100).cast("bigint"))
    aggs = [("max", "vc", "mx"), ("min", "vc", "mn"), ("count", None, "n")]
    small = windowed_agg(
        ev, "ts", 600, 10, aggs, use_prefix=True, prefix_panes_per_chunk=64
    )
    big = windowed_agg(ev, "ts", 600, 10, aggs, use_prefix=True)
    ok, msg = rows_match(small.collect(), big.collect(), float_tol=1e-9)
    assert ok, msg


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),        # bucket index
            st.integers(min_value=-10_000, max_value=10_000),  # value
        ),
        min_size=2,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
)
def test_interpolated_fill_properties(spark_session_holder, vals):
    """For ANY gapped integer series: present buckets pass through as
    (v, 1); every spine bucket between first and last present gets a
    row with den > 0; within a gap the exact fractions are collinear
    (den constant = gap width, num steps by a constant); and the
    fraction at a gap edge reproduces the neighbor exactly."""
    from pyspark.sql import functions as F

    from lightsaber_spark.operators.window_agg import interpolated_fill

    spark, _events = spark_session_holder
    present = dict(vals)
    agg = spark.createDataFrame(
        [("k", t, v) for t, v in present.items()], "k string, t long, v long"
    )
    lo, hi = min(present), max(present)
    spine = spark.createDataFrame(
        [("k", t) for t in range(lo, hi + 1)], "k string, t long"
    )
    out = {
        r.t: (r.num, r.den)
        for r in interpolated_fill(agg, spine, "v", keys=["k"], t_col="t").collect()
    }
    assert set(out) == set(range(lo, hi + 1))
    ts = sorted(present)
    for t, (num, den) in out.items():
        assert den > 0
        if t in present:
            assert (num, den) == (present[t], 1)
        else:
            import bisect

            i = bisect.bisect_left(ts, t)
            pt, nt = ts[i - 1], ts[i]
            pv, nv = present[pt], present[nt]
            assert den == nt - pt
            assert num == pv * (nt - t) + nv * (t - pt)
            # collinearity: exact fraction lies on the segment
            assert min(pv, nv) * den <= num <= max(pv, nv) * den
