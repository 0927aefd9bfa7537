"""Unit coverage for the round-7 pagerank setup paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightsaber_spark.operators.iterative import pagerank


def _toy_edges(spark):
    # symmetrized triangle + pendant: 1-2, 2-3, 1-3, 3-4
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, ["src", "dst"])


def test_edges_materialized_matches_default(spark):
    """Skipping the internal |E|-row checkpoint must be a pure plan
    change: ranks identical bit-for-bit to the default path."""
    base = {
        (r.node, r.rank_scaled)
        for r in pagerank(_toy_edges(spark), iterations=3).collect()
    }
    skip = {
        (r.node, r.rank_scaled)
        for r in pagerank(
            _toy_edges(spark).localCheckpoint(),
            iterations=3,
            edges_materialized=True,
        ).collect()
    }
    assert base == skip


def test_dim_bounded_matches_default(spark):
    """The broadcast-iteration path (dim_bounded_nodes, including the
    round-7 broadcast of the summed contributions) is a plan hint only
    — same integer ranks as the shuffle path."""
    plain = {
        (r.node, r.rank_scaled)
        for r in pagerank(_toy_edges(spark), iterations=3).collect()
    }
    dim = {
        (r.node, r.rank_scaled)
        for r in pagerank(
            _toy_edges(spark), iterations=3, dim_bounded_nodes=True
        ).collect()
    }
    assert plain == dim


def test_pagerank_pairs_materialize_dir(spark, tmp_path):
    """The pair-list escape hatch: parquet written once, _SUCCESS-
    guarded reuse, identical rows to the derived path (measured round
    9: ~40% of warm query time saved on repeated runs)."""
    import os

    from lightsaber_spark.staged_queries import _pagerank_pairs

    sf = "/root/testdata/sf0.001"
    d = str(tmp_path / "pr_pairs")
    a = _pagerank_pairs(spark, sf, materialize_dir=d)
    sub = [p for p in os.listdir(d) if p.startswith("pagerank_pairs_")]
    assert len(sub) == 1, "pair list written once under materialize_dir"
    assert os.path.exists(os.path.join(d, sub[0], "_SUCCESS"))
    b = _pagerank_pairs(spark, sf)  # derived path
    got = sorted((r.c, r.s) for r in a.collect())
    want = sorted((r.c, r.s) for r in b.collect())
    assert got == want
    # second call reuses the complete write (mtime unchanged)
    m0 = os.path.getmtime(os.path.join(d, sub[0], "_SUCCESS"))
    _pagerank_pairs(spark, sf, materialize_dir=d).count()
    assert os.path.getmtime(os.path.join(d, sub[0], "_SUCCESS")) == m0
