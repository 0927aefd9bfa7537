"""Iterative graph computation: integer-scaled PageRank.

Companion to the connected-components engine in
``functions/dedup.py:duplicate_groups`` (min-label + pointer jumping) —
together they cover the two iterative-fixpoint shapes a data pipeline
needs (equivalence classes, and importance/propagation scores).

Design for exact cross-engine parity: every arithmetic step is integer.
Ranks are scaled by ``scale`` (default 10^12); each iteration computes

    rank'(v) = (15 * (scale div N)) div 100
             + (85 * sum_{u -> v} (rank(u) div outdeg(u))) div 100

with truncating integer division on both engines (Spark ``div``, DuckDB
``//`` — all operands non-negative, so truncation == floor and the two
agree; see the CLAUDE.md cast-rounding gotcha).  A fixed iteration
count (not a convergence test) keeps the computation a deterministic
finite plan that a chained-CTE SQL oracle reproduces bit for bit.

Scale: each iteration is one equi-join (edges ⋈ ranks, shuffled on the
node key — or map-side under ``dim_bounded_nodes``) plus one groupBy —
the standard Pregel-on-relational shape that survives 1000 executors.
The static (node, N) relation is hoisted out of the loop, so each
round references the previous ranks exactly ONCE and the lazy plan
grows linearly with the fixed iteration count — no per-round
checkpoint (contrast ``duplicate_groups``, whose convergence test
forces one); only the setup relations (edges unless the caller already
materialized an equivalent, edge×degree, initial ranks) are
``localCheckpoint``-ed, documented bounded materializations.

Overflow: rank ≤ scale ≤ 10^12, so 85 * rank ≤ 8.5e13 and the contrib
sum over all in-edges ≤ total rank mass ≤ scale — everything stays far
below 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    scale: int = 10**12,
    src: str = "src",
    dst: str = "dst",
    dim_bounded_nodes: bool = False,
    edges_materialized: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list (pass both directions for an
    undirected graph). Returns (node, rank_scaled) for every node that
    appears in the edge list.

    Every node must have out-degree ≥ 1 (true for symmetrized graphs);
    rank mass from dangling nodes is otherwise dropped, mirroring the
    oracle.

    ``dim_bounded_nodes=True`` declares |V| dimension-bounded (node
    keys drawn from a dimension table, not a fact table — e.g. the
    customer↔supplier graph, where |V| ≤ |customer| + |supplier| no
    matter how many orders arrive). The |V|-row relations (out-degree,
    per-iteration ranks) are then broadcast, so the |E|-row edge
    relation is NEVER shuffled after its one setup materialization:
    each iteration is a map-side join + a partial-aggregated groupBy
    whose shuffle carries ≈ |V| rows per partition, not |E|.
    localCheckpoint does NOT preserve outputPartitioning (the scan
    comes back as ``UnknownPartitioning``), so without the broadcast
    both join sides reshuffle every round — leave the flag False only
    for fact-scale node sets, where the sort-merge path is the one
    that survives.

    ``edges_materialized=True`` declares the edge relation already
    cheap to re-scan (a projection/union of a relation the CALLER
    checkpointed — e.g. the symmetrized pair list, which is HALF the
    edge rows), so the internal |E|-row localCheckpoint is skipped.
    Measured (round 7, sf0.1 customer↔supplier, 1.17M edges): caller
    checkpoints the 587K-row pair list and skips the edge checkpoint →
    warm 5.5 s → ~2.7 s, same bit-exact result.
    """
    edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_materialized:
        edges = edges.localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Lazy scalar N via a broadcast 1-row cross join — no driver action.
    n1 = nodes.agg(F.count(F.lit(1)).alias("_n"))
    ranks = (
        nodes.crossJoin(F.broadcast(n1))
        .select("node", "_n", F.expr(f"{scale} div _n").alias("rank"))
        .localCheckpoint()
    )
    # (src, dst, deg) is consumed by every iteration — materialize the
    # join once rather than recomputing it lazily per round.
    deg_side = F.broadcast(deg) if dim_bounded_nodes else deg
    out = edges.join(deg_side, "src").localCheckpoint()
    # (node, _n) never changes across rounds — hoisting it means each
    # round references the PREVIOUS ranks exactly once (via contrib),
    # so the lazy plan grows linearly (a 4-deep chain), not 2^rounds:
    # no per-round localCheckpoint needed (contrast duplicate_groups,
    # whose convergence test forces a materialization per round). The
    # whole fixed-iteration computation stays ONE lazy plan evaluated
    # in a single job.
    nodes_n = ranks.select("node", "_n")
    for _ in range(iterations):
        rank_side = ranks.select(F.col("node").alias("src"), "rank")
        if dim_bounded_nodes:
            rank_side = F.broadcast(rank_side)
        contrib = out.join(rank_side, "src").select(
            F.col("dst").alias("node"), F.expr("rank div deg").alias("c")
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("_sc"))
        # |V|-bounded when dim_bounded_nodes: broadcasting the summed
        # contributions makes the rank-update join map-side too, so no
        # per-round exchange of nodes_n
        if dim_bounded_nodes:
            summed = F.broadcast(summed)
        ranks = nodes_n.join(summed, "node", "left").select(
            "node",
            "_n",
            F.expr(
                f"(15 * ({scale} div _n)) div 100"
                " + (85 * coalesce(_sc, 0)) div 100"
            ).alias("rank"),
        )
    return ranks.select("node", F.col("rank").alias("rank_scaled"))


def pagerank_oracle_sql(
    edges_sql: str,
    iterations: int = 4,
    scale: int = 10**12,
) -> str:
    """DuckDB twin of :func:`pagerank` as chained CTEs (one per
    iteration — the fixed iteration count makes the unrolling finite).
    ``edges_sql`` must select columns ``src, dst``. Returns a relation
    ``(node, rank_scaled)``; embed with ``WITH _pr_edges AS (...)``."""
    parts = [
        f"_pr_edges AS ({edges_sql})",
        "_pr_deg AS (SELECT src, COUNT(*) AS deg FROM _pr_edges GROUP BY src)",
        "_pr_nodes AS (SELECT src AS node FROM _pr_edges"
        " UNION SELECT dst FROM _pr_edges)",
        "_pr_n AS (SELECT COUNT(*) AS n FROM _pr_nodes)",
        f"_pr_r0 AS (SELECT node, {scale} // (SELECT n FROM _pr_n) AS rank"
        " FROM _pr_nodes)",
    ]
    for i in range(1, iterations + 1):
        prev = f"_pr_r{i - 1}"
        parts.append(
            f"_pr_r{i} AS ("
            f"SELECT nd.node, "
            f"(15 * ({scale} // (SELECT n FROM _pr_n))) // 100"
            f" + (85 * COALESCE(CAST(s.sc AS BIGINT), 0)) // 100 AS rank "
            f"FROM _pr_nodes nd LEFT JOIN ("
            f"SELECT e.dst AS node, SUM(r.rank // d.deg) AS sc "
            f"FROM _pr_edges e JOIN _pr_deg d ON e.src = d.src "
            f"JOIN {prev} r ON r.node = e.src GROUP BY e.dst) s "
            f"ON nd.node = s.node)"
        )
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT node, CAST(rank AS BIGINT) AS rank_scaled"
        f" FROM _pr_r{iterations}"
    )
