"""Learned quality classifier (functions/classifier.py): integer
division semantics, feature bounds, fit stability / non-degeneracy.
Cross-engine training equivalence is the driver oracle's job
(quality_learned_classifier unrolls the whole fit in DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightsaber_spark.functions.classifier import (
    _half_up_mean,
    _tdiv,
    centroid_perceptron_fit,
    margin_expr,
    quality_feature_frame,
)


def test_integer_division_semantics():
    # truncation toward zero — BOTH engines' rule; python // floors
    assert _tdiv(-7, 2) == -3 and _tdiv(7, 2) == 3
    assert _tdiv(-1, 4) == 0
    # HALF_UP means, including the negative-sum case the SQL oracle
    # never hits (features non-negative) but the API allows
    assert _half_up_mean(5, 2) == 3      # 2.5 → 3
    assert _half_up_mean(-5, 2) == -3    # -2.5 → -3 (away from zero)
    assert _half_up_mean(7, 3) == 2      # 2.33 → 2


def test_feature_frame_bounds_and_schema(spark):
    from lightsaber_spark.session import load_tables
    from tests.conftest import SF_DIR

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    k = 8
    feats = quality_feature_frame(docs, k=k)
    cols = [f"f{j}" for j in range(k + 3)]
    assert feats.columns == ["doc_id"] + cols
    # permille features bounded [0,1000]; token-count feature capped
    mm = feats.agg(
        *[F.min(c).alias(f"lo{c}") for c in cols],
        *[F.max(c).alias(f"hi{c}") for c in cols],
    ).collect()[0]
    for c in cols:
        assert mm[f"lo{c}"] >= 0, c
        assert mm[f"hi{c}"] <= 1000, c


def test_fit_learns_nondegenerate_gate(spark):
    from lightsaber_spark.session import load_tables
    from tests.conftest import SF_DIR

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    k = 8
    fcols = [f"f{j}" for j in range(k + 3)]
    labeled = quality_feature_frame(docs, k=k).withColumn(
        "y",
        F.when(
            2 * F.col("f8") + F.col("f9") + 3 * (F.col("f10") - 800) >= 640,
            1,
        ).otherwise(0).cast("bigint"),
    )
    train = labeled.filter(F.col("doc_id") % 4 < 3)
    w = centroid_perceptron_fit(train, fcols, "y", rounds=4, shift=2)
    assert len(w) == len(fcols) + 1 and all(isinstance(x, int) for x in w)

    m = margin_expr(w, fcols)
    scored = labeled.select(
        "y", F.when(m > 0, 1).otherwise(0).alias("pred")
    )
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pred").alias("pos"),
        F.sum((F.col("y") == F.col("pred")).cast("int")).alias("agree"),
    ).collect()[0]
    # learned, not memorized majority: both classes predicted, and
    # accuracy well above the majority-class base rate
    assert 0 < row["pos"] < row["n"]
    assert row["agree"] / row["n"] >= 0.85
