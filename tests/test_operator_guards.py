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
