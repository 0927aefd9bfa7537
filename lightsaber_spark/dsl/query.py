"""Query / QueryApplication — dataflow assembly.

Reference: ``src/utils/Query.h:20-28`` (a chain of pipelineable
operators run as one fused task) and ``src/utils/QueryApplication.h:20-31``
(a DAG of queries wired with ``Query::connectTo``, topologically sorted
at ``QueryApplication.h:63``).

Here a Query is a list of DSL operators applied in order to an input
DataFrame — lazily, so a multi-query DAG is just DataFrame lineage; the
reference's dispatcher/worker-pool/result-slot machinery
(``src/dispatcher/``, ``src/result/``) has no analog because Spark's
scheduler owns execution (SURVEY.md §3.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from lightsaber_spark.dsl.operators import Operator
from lightsaber_spark.dsl.schema import TupleSchema
from lightsaber_spark.dsl.windows import WindowDefinition


class Query:
    def __init__(
        self,
        query_id: int,
        operators: Sequence[Operator],
        window: WindowDefinition | None = None,
        schema: TupleSchema | None = None,
    ) -> None:
        self.query_id = query_id
        self.operators = list(operators)
        self.window = window
        self.schema = schema
        self.downstream: list[Query] = []
        self.upstream: list[Query] = []

    def connect_to(self, other: "Query") -> "Query":
        """``Query::connectTo(Query*)`` (``src/utils/Query.h:111``)."""
        self.downstream.append(other)
        other.upstream.append(self)
        return other

    # camelCase alias for reference-shaped call sites
    connectTo = connect_to

    def compile(self, df: DataFrame) -> DataFrame:
        for op in self.operators:
            df = op.apply(df)
        return df


class QueryApplication:
    """DAG of queries; ``run`` feeds sources and returns each sink
    query's DataFrame (``src/utils/QueryApplication.h:20-43``)."""

    def __init__(self, queries: Sequence[Query]) -> None:
        self.queries = list(queries)

    def _topo_order(self) -> list[Query]:
        seen: dict[int, int] = {}
        order: list[Query] = []

        def visit(q: Query, path: set[int]) -> None:
            if seen.get(id(q)) == 2:
                return
            if id(q) in path:
                raise ValueError("cycle in query DAG")
            path.add(id(q))
            for up in q.upstream:
                visit(up, path)
            path.discard(id(q))
            seen[id(q)] = 2
            order.append(q)

        for q in self.queries:
            visit(q, set())
        return order

    def run(self, sources: dict[int, DataFrame]) -> dict[int, DataFrame]:
        """``sources`` maps query_id → input DataFrame for DAG roots.
        Returns query_id → output DataFrame for every query."""
        results: dict[int, DataFrame] = {}
        for q in self._topo_order():
            if q.upstream:
                if len(q.upstream) != 1:
                    raise ValueError(
                        "multi-input queries take their second input via "
                        "ThetaJoin.setup(other_df, ...)"
                    )
                df = results[q.upstream[0].query_id]
            else:
                df = sources[q.query_id]
            results[q.query_id] = q.compile(df)
        return results
