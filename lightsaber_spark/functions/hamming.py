"""Banded Hamming-distance retrieval, shared by the perceptual-hash
near-dup paths (image aHash in ``image_dedup.py``, audio fingerprints
in ``audio_dedup.py``) and shaped like ``dedup.py:simhash_pairs``:

- split the n-bit signature into ``n_bands`` equal bit-bands;
- pairs within Hamming distance < n_bands must share at least one
  whole band (pigeonhole), so retrieval is a (band, bucket) equi-join —
  never an all-pairs product;
- verify candidates with exact ``bit_count(xor)``.

Lossless for ``max_hamming < n_bands``; the constructor enforces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_hamming_pairs(
    sig: DataFrame,
    id_col: str,
    hash_col: str,
    n_bits: int,
    n_bands: int,
    max_hamming: int,
    align_cols: tuple[str, ...] = (),
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Pairs ``(id_a < id_b, [align_cols,] [carries,] hamming)`` with
    ``hamming <= max_hamming`` over signed-long signatures in ``sig``.
    Equi-join retrieval + exact verification; see module docstring for
    the losslessness argument.

    ``align_cols`` are extra equality keys both sides must share (e.g.
    a frame index, so only co-positioned video frames pair) — they join
    alongside (band, bucket) and are carried into the output.

    ``carry_cols`` (r15 OPT, guide §2.4 "share one exchange") are
    payload columns of ``sig`` carried through BOTH sides into the
    output as ``<c>_a`` / ``<c>_b`` — e.g. a multiplicity count, so a
    consumer that previously re-joined the pair table back to ``sig``
    per side (two extra joins + exchanges) reads them directly.

    CONTRACT (hardened r16, per the r15 ADVICE): every carry column
    must be FUNCTIONALLY DEPENDENT on ``id_col`` within ``sig``. The
    candidate dedup is keyed on the pair identity (ids, align, hashes)
    ONLY, with carries attached via ``max`` — identical to the r15
    widened-distinct output when the dependence holds (max of one
    value is the value), and no longer able to silently DUPLICATE
    (id_a, id_b) rows and inflate downstream multiplicity sums when a
    caller violates it (the output stays one row per pair either
    way)."""
    if n_bits % n_bands:
        raise ValueError("n_bands must divide n_bits")
    if not 0 < n_bits <= 64:
        # signatures are ONE signed long: for n_bits > 64 the JVM masks
        # shift amounts mod 64, silently duplicating low bands — bands
        # over the (nonexistent) upper bits never form, retrieval goes
        # LOSSY with no error (r12 review)
        raise ValueError("signatures are single 64-bit longs: n_bits must be <= 64")
    if not 0 <= max_hamming < n_bands:
        raise ValueError(
            "banded retrieval is lossless only for max_hamming < n_bands"
        )
    width = n_bits // n_bands
    mask = (1 << width) - 1
    align = list(align_cols)
    carry = list(carry_cols)
    # two selects: the band expressions reference `_hash`, which must
    # already exist (a same-select lateral alias reference trips
    # Catalyst's LCA check under explode)
    renamed = sig.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_hash"),
        *align, *carry,
    )
    bands = renamed.select(
        "_id",
        "_hash",
        *align,
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(_hash >> {width * b}) & {mask}").alias(
                            "bucket"
                        ),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_hash", *align, *carry, "bb.band", "bb.bucket")
    a = bands.select(
        F.col("_id").alias("id_a"), F.col("_hash").alias("hash_a"),
        *align, *[F.col(c).alias(f"{c}_a") for c in carry], "band", "bucket",
    )
    b = bands.select(
        F.col("_id").alias("id_b"), F.col("_hash").alias("hash_b"),
        *align, *[F.col(c).alias(f"{c}_b") for c in carry], "band", "bucket",
    )
    carried = [f"{c}_a" for c in carry] + [f"{c}_b" for c in carry]
    joined = (
        a.join(b, [*align, "band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *align, *carried, "hash_a", "hash_b")
    )
    pair_keys = ["id_a", "id_b", *align, "hash_a", "hash_b"]
    if carried:
        # dedup keyed on the PAIR identity only; carries attached by
        # max (== the carried value under the functional-dependence
        # contract above) — never widens the distinct key
        cand = joined.groupBy(*pair_keys).agg(
            *[F.max(c).alias(c) for c in carried]
        )
    else:
        cand = joined.distinct()
    ham = F.expr("bit_count(hash_a ^ hash_b)").cast("bigint")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", *align, *carried, "hamming")
    )
