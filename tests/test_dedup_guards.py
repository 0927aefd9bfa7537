"""API guards on the dedup family (round-7 robustness fixes)."""

from __future__ import annotations

import pytest

from lightsaber_spark.functions.dedup import duplicate_groups


def test_duplicate_groups_rejects_zero_iters(spark):
    """iters=0 has no labels relation to return — must raise up front
    instead of crashing with an undefined-variable error mid-plan."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["id_a", "id_b"]
    )
    with pytest.raises(ValueError, match="iters must be >= 1"):
        duplicate_groups(pairs, iters=0)


def test_duplicate_groups_one_iter_is_valid(spark):
    """iters=1 is the minimum meaningful round count: one min-label +
    pointer-jump pass, which fully labels a single-edge component."""
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    rows = {
        r.member: r.representative
        for r in duplicate_groups(pairs, iters=1).collect()
    }
    assert rows == {1: 1, 2: 1}
