"""As-of join unit tests on synthetic interleaved timestamps (ADVICE
r2: the TPC-H-backed queries were vacuous, so forward direction and
tolerance nulling had no non-trivial coverage).

Timeline per key (seconds): rights at 10, 20, 20, 40; lefts at 5, 10,
15, 25, 40, 50 — exercises before-any-right, exact-equality ties,
between-rights, and after-all-rights for both directions, plus the
tolerance cutoff.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from lightsaber_spark.operators.joins import asof_join


def _ts(sec: int) -> datetime:
    return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(i, "k", _ts(s)) for i, s in enumerate([5, 10, 15, 25, 40, 50])]
        + [(100, "other", _ts(15))],
        "lid bigint, key string, lts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _ts(10), 1), ("k", _ts(20), 2), ("k", _ts(20), 3), ("k", _ts(40), 4)],
        "key string, rts timestamp, rval bigint",
    )
    return left, right


def _vals(out):
    return {r.lid: r.rval for r in out.collect()}

def test_asof_backward(frames):
    left, right = frames
    got = _vals(asof_join(left, right, "lts", "rts", by=["key"]))
    # lid0 @5: no right yet -> null; lid1 @10: equality included -> 1;
    # lid3 @25: one of the tied pair @20 (tie order between equal right
    # timestamps is unspecified, as in DuckDB ASOF); lid5 @50 -> 4
    assert got[0] is None
    assert got[1] == 1
    assert got[2] == 1
    assert got[3] in (2, 3)
    assert got[4] == 4
    assert got[5] == 4
    assert got[100] is None


def test_asof_forward_includes_equality(frames):
    left, right = frames
    got = _vals(asof_join(left, right, "lts", "rts", by=["key"], direction="forward"))
    assert got[0] == 1
    assert got[1] == 1  # right AT the left timestamp must match (>=)
    assert got[2] in (2, 3)  # tied pair @20, tie order unspecified
    assert got[3] == 4
    assert got[4] == 4  # equality again, at 40
    assert got[5] is None  # nothing after 50
    assert got[100] is None


def test_asof_tolerance_exact_boundaries(frames):
    left, right = frames
    got = _vals(asof_join(left, right, "lts", "rts", by=["key"], tolerance_sec=5))
    # lid0 @5: no match -> null
    # lid1 @10: match @10, delta 0 -> 1
    # lid2 @15: match @10, delta 5 -> kept (inclusive)
    # lid3 @25: one of the tied pair @20, delta 5 -> kept (tie order
    # between equal right timestamps is unspecified, as elsewhere)
    # lid4 @40: match @40, delta 0 -> 4
    # lid5 @50: match @40, delta 10 -> nulled
    assert got[0] is None
    assert got[1] == 1
    assert got[2] == 1
    assert got[3] in (2, 3)
    assert got[4] == 4
    assert got[5] is None


def test_asof_forward_tolerance(frames):
    left, right = frames
    got = _vals(
        asof_join(
            left, right, "lts", "rts", by=["key"],
            direction="forward", tolerance_sec=5,
        )
    )
    # lid0 @5 -> @10, delta 5 kept; lid3 @25 -> @40, delta 15 nulled
    assert got[0] == 1
    assert got[1] == 1
    assert got[3] is None
    assert got[4] == 4
    assert got[5] is None


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("tolerance", [None, 10])
def test_asof_broadcast_matches_union_scan(frames, direction, tolerance):
    """The broadcast binary-search plan and the union+window-scan plan
    are two physical strategies for the SAME operator: matched right
    TIMESTAMPS must agree on every left row, for both directions, with
    and without tolerance (value ties at equal timestamps are
    unspecified in both, so the comparison is on timestamps)."""
    from lightsaber_spark.operators.joins import asof_broadcast_join

    left, right = frames
    scan = asof_join(
        left, right, "lts", "rts", by=["key"],
        direction=direction, tolerance_sec=tolerance,
    )
    scan_ts = {
        r.lid: r.m
        for r in scan.select(
            "lid", F.expr("unix_micros(rts)").alias("m")
        ).collect()
    }
    bc = asof_broadcast_join(
        left, right, "lts", "rts", ["key"],
        direction=direction, tolerance_sec=tolerance, out_col="m",
    )
    bc_ts = {r.lid: r.m for r in bc.select("lid", "m").collect()}
    assert bc_ts == scan_ts


def test_asof_broadcast_nearest(frames):
    """nearest: whichever side is closer wins, ties to backward;
    tolerance nulls matches farther than the bound in EITHER
    direction."""
    from lightsaber_spark.operators.joins import asof_broadcast_join

    left, right = frames
    got = {
        r.lid: r.m
        for r in asof_broadcast_join(
            left, right, "lts", "rts", ["key"], direction="nearest", out_col="m"
        ).collect()
    }
    # lefts at 5,10,15,25,40,50 vs rights at 10,20,20,40:
    # 5→10 (only forward), 10→10 (exact), 15→10 or 20 (equidistant —
    # tie to backward → 10), 25→20, 40→40, 50→40; other-key → null
    assert got[0] == 10_000_000
    assert got[1] == 10_000_000
    assert got[2] == 10_000_000       # tie 15±5 → backward
    assert got[3] == 20_000_000
    assert got[4] == 40_000_000
    assert got[5] == 40_000_000
    assert got[100] is None

    tol = {
        r.lid: r.m
        for r in asof_broadcast_join(
            left, right, "lts", "rts", ["key"],
            direction="nearest", tolerance_sec=6, out_col="m",
        ).collect()
    }
    assert tol[0] == 10_000_000       # |5-10|=5 <= 6
    assert tol[3] == 20_000_000       # |25-20|=5 <= 6
    assert tol[5] is None             # |50-40|=10 > 6
