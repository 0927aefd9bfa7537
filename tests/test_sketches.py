"""KMV distinct sketch: exactness below k, estimator sanity above k,
and per-group independence. Cross-engine value parity is covered by the
oracle-parity suite (kmv_distinct_users_by_type)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightsaber_spark.functions.sketches import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 5).alias("g"), ((F.col("id") / 5).cast("long") % 40).alias("v")
    )
    # 40 distinct hashed values per group < k=64 → exact per group
    out = {r["g"]: r["n"] for r in
           kmv_distinct(df, ["g"], "v", k=64, out_col="n").collect()}
    assert out == {g: 40 for g in range(5)}


def test_kmv_estimator_above_k(spark):
    df = spark.range(0, 10_000).select(F.lit(1).alias("g"), F.col("id").alias("v"))
    [row] = kmv_distinct(df, ["g"], "v", k=256, out_col="n").collect()
    # standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 5 sigma
    assert abs(row["n"] - 10_000) / 10_000 < 0.32


def test_kmv_global_no_groups(spark):
    df = spark.range(0, 30).select(F.col("id").alias("v"))
    [row] = kmv_distinct(df, [], "v", k=64, out_col="n").collect()
    assert row["n"] == 30


def test_simhash_udf_equals_relational(spark, tables):
    """The Arrow-batched SimHash must be bit-identical to the
    explode(tokens)×explode(bits) relational form (hashlib md5 ==
    Spark md5; integer-only arithmetic)."""
    from lightsaber_spark.functions.dedup import simhash

    docs = tables["documents"]
    a = sorted(tuple(r) for r in simhash(docs, use_udf=True).collect())
    b = sorted(tuple(r) for r in simhash(docs, use_udf=False).collect())
    assert a == b and len(a) > 0
