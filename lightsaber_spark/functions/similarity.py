"""Similarity search over embedding columns.

Beyond-parity surface: brute-force cosine top-k as the correctness
baseline, and a deterministic random-hyperplane LSH bucketing as the
scale path (candidates via equi-join on bucket signature instead of an
all-pairs cross join).

Determinism contract: embeddings are float32; elements are scaled to
exact integers (×10^6) so dot products / norms are order-independent
bigints and results reproduce bit-identically in the DuckDB oracle
(two-arg list_transform lambda + list_sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SCALE = 1_000_000


def _int_dot(a: Column, b: Column) -> Column:
    """Σ round(a_i·10^6)·round(b_i·10^6) as exact bigint."""
    prods = F.zip_with(
        a, b,
        lambda x, y: (F.round(x.cast("double") * SCALE).cast("bigint")
                      * F.round(y.cast("double") * SCALE).cast("bigint")),
    )
    return F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def _int_norm2(a: Column) -> Column:
    return _int_dot(a, a)


def int_cosine(a: Column, b: Column) -> Column:
    """Cosine similarity on integer-scaled vectors: exact integer dot /
    sqrt of exact integer norms — deterministic across engines."""
    return _int_dot(a, b) / (F.sqrt(_int_norm2(a)) * F.sqrt(_int_norm2(b)))


def scaled_vec(a: Column) -> Column:
    """Integer-scaled copy of a float vector (compute once per row,
    before any pairwise op — scaling inside an O(n²) join would redo
    per-element rounding for every pair)."""
    return F.transform(a, lambda x: F.round(x.cast("double") * SCALE).cast("bigint"))


def _scaled_dot(a: Column, b: Column) -> Column:
    """Dot of two already-scaled bigint vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )


def _prep(df: DataFrame, id_col: str, vec_col: str, out_id: str) -> DataFrame:
    """(id, scaled vector, precomputed norm) — the pairwise-ready form."""
    s = df.select(F.col(id_col).alias(out_id), scaled_vec(F.col(vec_col)).alias("_sv"))
    return s.withColumn("_norm", F.sqrt(_scaled_dot(F.col("_sv"), F.col("_sv"))))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding
    self-matches by id). The correctness baseline: broadcast the query
    side (small), scan the corpus once, per-query heap via rank.

    At 100 TB the corpus side stays partitioned and un-shuffled; only
    queries (k·|Q| rows) move. Ties break by neighbor id ascending."""
    q = _prep(queries, id_col, vec_col, "query_id").withColumnsRenamed(
        {"_sv": "_qv", "_norm": "_qn"}
    )
    c = _prep(corpus, id_col, vec_col, "neighbor_id")
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _scaled_dot(F.col("_qv"), F.col("_sv")) / (F.col("_qn") * F.col("_norm")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rank"))
    )


def hyperplane_signature(
    vec: Column, n_planes: int = 8, dim: int = 64, salt: str = "lsh", scaled: bool = False
) -> Column:
    """Deterministic random-hyperplane signature (bigint bucket id).

    Plane p's weight for dimension i is ±1 derived from md5(salt_p_i) —
    reproducible in any engine, no stored plane matrix. Sign of the
    integer-scaled dot product gives bit p. ``scaled=True`` means the
    vector is already integer-scaled (via :func:`scaled_vec`)."""
    # NB: the per-plane lambda must stay single-argument — F.transform
    # treats a second parameter as the array index and would shadow `p`
    def _term_fn(p: int):
        prefix = f"{salt}_{p}_"

        def body(i):
            e = F.element_at(vec, i + 1)
            elem = e if scaled else F.round(e.cast("double") * SCALE).cast("bigint")
            sign = (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(prefix), i.cast("string"))), 1, 15),
                    16, 10,
                ).cast("bigint") % 2 * 2 - 1
            )
            return elem * sign

        return body

    bits = []
    for p in range(n_planes):
        terms = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), _term_fn(p))
        dot = F.aggregate(terms, F.lit(0).cast("bigint"), lambda acc, v: acc + v)
        bits.append(F.when(dot > 0, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0).cast("bigint")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def hyperplane_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket
    (equi-join on signature — the scale path replacing the cross join),
    ranked by exact integer cosine. Recall < 1 by construction; raise
    n_planes bands or multi-probe for higher recall."""
    q = _prep(queries, id_col, vec_col, "query_id").withColumnsRenamed(
        {"_sv": "_qv", "_norm": "_qn"}
    ).withColumn("_sig", hyperplane_signature(F.col("_qv"), n_planes, dim, scaled=True))
    c = _prep(corpus, id_col, vec_col, "neighbor_id").withColumn(
        "_sig", hyperplane_signature(F.col("_sv"), n_planes, dim, scaled=True)
    )
    scored = (
        q.join(c, ["_sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _scaled_dot(F.col("_qv"), F.col("_sv")) / (F.col("_qn") * F.col("_norm")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rk").alias("rank"))
    )
