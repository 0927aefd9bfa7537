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
