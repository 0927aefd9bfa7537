"""Operator algebra → DataFrame transformations.

Mirrors the reference operator set (SURVEY.md §2.1): Selection,
Projection, Aggregation (windowed), HAVING, StaticHashJoin, ThetaJoin,
NoOp. The reference fuses these into one JIT'd kernel via
``OperatorKernel`` (``src/cql/operators/codeGeneration/OperatorKernel.h``);
here each ``apply`` is a lazy DataFrame transformation and Catalyst's
whole-stage codegen performs the fusion — there is deliberately no
OperatorKernel analog (SURVEY.md §4).

Ordinal column references resolve against the operator's *input*
DataFrame positionally, matching the reference's convention that
attribute 0 is the event-time column (``src/utils/TupleSchema.h:25``).
"""

from __future__ import annotations

import enum
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from lightsaber_spark.dsl.expressions import ColumnReference, Expression
from lightsaber_spark.dsl.predicates import Predicate
from lightsaber_spark.dsl.schema import BasicType, TupleSchema
from lightsaber_spark.dsl.windows import WindowDefinition, WindowMeasure, WindowType
from lightsaber_spark.operators.window_agg import windowed_agg
from lightsaber_spark.operators.row_window import row_window_agg
from lightsaber_spark.operators.joins import static_hash_join, theta_join


def _schema_of(df: DataFrame) -> TupleSchema:
    """Positional schema view of a DataFrame for ordinal resolution."""
    return TupleSchema(
        [BasicType.Long] * len(df.columns), names=list(df.columns), has_timestamp=True
    )


class Operator:
    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError


class NoOp(Operator):
    """Identity (``src/cql/operators/NoOp.h:14-65``)."""

    def __init__(self, schema: TupleSchema | None = None) -> None:
        self.schema = schema

    def apply(self, df: DataFrame) -> DataFrame:
        return df


class Selection(Operator):
    """Row filter (``src/cql/operators/Selection.h:11-45``)."""

    def __init__(self, predicate: Predicate) -> None:
        self.predicate = predicate

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate.compile(_schema_of(df)))


class Projection(Operator):
    """Per-row expression list (``src/cql/operators/Projection.h:14-71``).

    ``names`` default to the reference's output convention (first
    expression keeps the timestamp name when it is a plain column 0
    reference; others become ``atr_i``).
    """

    def __init__(
        self, expressions: Sequence[Expression], names: Sequence[str] | None = None
    ) -> None:
        self.expressions = list(expressions)
        self.names = list(names) if names is not None else None

    def apply(self, df: DataFrame) -> DataFrame:
        schema = _schema_of(df)
        names = self.names
        if names is None:
            names = []
            for i, e in enumerate(self.expressions):
                if isinstance(e, ColumnReference):
                    names.append(e.resolved_name(schema))
                else:
                    names.append(f"atr_{i}")
        return df.select(
            *[e.compile(schema).alias(n) for e, n in zip(self.expressions, names)]
        )


class AggregationType(enum.Enum):
    """``src/cql/operators/AggregationType.h:12``."""

    MAX = "max"
    MIN = "min"
    CNT = "count"
    SUM = "sum"
    AVG = "avg"
    # weighted average over a (value, weight) attribute pair
    # (AggregationType.h:12; lift/combine AggregationTree.h:106-133)
    W_AVG = "w_avg"


class Aggregation(Operator):
    """Windowed aggregation (``src/cql/operators/Aggregation.h:17-199``).

    Output schema follows the reference (``Aggregation.h:53-87``):
    window start, group-by keys, one column per aggregate (named
    ``<fn>_<attr>``), plus a ``count`` column when ``include_count``.
    """

    def __init__(
        self,
        window: WindowDefinition,
        agg_types: Sequence[AggregationType],
        agg_attributes: Sequence[ColumnReference],
        group_by: Sequence[Expression] = (),
        include_count: bool = False,
        ts_column: str | int = 0,
    ) -> None:
        if len(agg_types) != len(agg_attributes):
            raise ValueError("agg_types and agg_attributes must align")
        self.window = window
        self.agg_types = list(agg_types)
        self.agg_attributes = list(agg_attributes)
        self.group_by = list(group_by)
        self.include_count = include_count
        self.ts_column = ts_column

    def apply(self, df: DataFrame) -> DataFrame:
        schema = _schema_of(df)
        ts = (
            self.ts_column
            if isinstance(self.ts_column, str)
            else schema.attribute_name(self.ts_column)
        )

        # group-by expressions may be derived (e.g. LRB1's position/5280,
        # test/.../LRB1.cpp:23) — materialize them as columns first
        keys: list[str] = []
        for i, g in enumerate(self.group_by):
            if isinstance(g, ColumnReference):
                keys.append(g.resolved_name(schema))
            else:
                name = f"key_{i}"
                df = df.withColumn(name, g.compile(schema))
                keys.append(name)

        aggs = []
        for t, a in zip(self.agg_types, self.agg_attributes):
            if t is AggregationType.W_AVG:
                v, w = a  # (value, weight) ColumnReference pair
                vn, wn = v.resolved_name(schema), w.resolved_name(schema)
                aggs.append((t.value, (vn, wn), f"w_avg_{vn}"))
            else:
                n = a.resolved_name(schema)
                aggs.append((t.value, n, f"{t.value}_{n}"))
        if self.include_count:
            aggs.append(("count", None, "count"))

        w = self.window
        if w.type == WindowType.SESSION:
            from lightsaber_spark.streaming.sessions import session_window_agg

            return session_window_agg(df, ts, w.gap, aggs, keys)
        if w.measure == WindowMeasure.RANGE_BASED:
            return windowed_agg(df, ts, w.size, w.slide, aggs, keys)
        order = [ts] + [c for c in df.columns if c != ts]
        return row_window_agg(df, order, w.size, w.slide, aggs, keys)


class PostWindowOperation(Operator):
    """Per-completed-window reduction over the aggregation output —
    the reference's ``setPostWindowOperation`` (raw C++ strings injected
    into the kernel, ``OperatorKernel.h:182-188``; NEXMark Q5 uses it as
    'auction(s) with the max bid count per window',
    ``test/.../Nexmark/NBQ5.cpp:42,73-103``).

    Declarative form: argmax (``k=1``, ties kept to match the reference
    post-op, which emits every key reaching the max) or general top-k
    over ``value_col`` within each window of the upstream
    ``Aggregation``'s output."""

    def __init__(
        self,
        key_col: str,
        value_col: str,
        k: int = 1,
        keep_ties: bool = True,
        window_cols: Sequence[str] = ("window_start",),
    ) -> None:
        self.key_col = key_col
        self.value_col = value_col
        self.k = k
        self.keep_ties = keep_ties
        self.window_cols = list(window_cols)

    def apply(self, df: DataFrame) -> DataFrame:
        from lightsaber_spark.operators.topk import post_window_argmax, window_topk

        if self.k == 1:
            return post_window_argmax(
                df, self.window_cols, self.key_col, self.value_col, self.keep_ties
            )
        return window_topk(
            df, self.window_cols, self.value_col, self.k,
            tie_breakers=[self.key_col],
        )


class HavingClause(Operator):
    """Post-aggregation predicate (``OperatorKernel.h:176-180``,
    used e.g. in ``test/.../LRB1.cpp:41-51``)."""

    def __init__(self, predicate: Predicate) -> None:
        self.predicate = predicate

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate.compile(_schema_of(df)))


class StaticHashJoin(Operator):
    """Stream×static equi join (``src/cql/operators/StaticHashJoin.h:14-79``).

    The reference takes the static side as a raw byte buffer plus three
    C++ code strings (build/probe); here it is simply a DataFrame and a
    key — the broadcast hash join is Catalyst's build-once hash table.
    """

    def __init__(self, static_df: DataFrame, on: str | Sequence[str]) -> None:
        self.static_df = static_df
        self.on = on

    def apply(self, df: DataFrame) -> DataFrame:
        return static_hash_join(df, self.static_df, self.on)


class ThetaJoin(Operator):
    """Stream×stream windowed theta join
    (``src/cql/operators/ThetaJoin.h:18-819``). Configured with the
    other side + per-side windows via :meth:`setup`, mirroring
    ``ThetaJoin::setup(WindowDefinition*, WindowDefinition*)``."""

    def __init__(self, predicate: Predicate | None) -> None:
        self.predicate = predicate
        self.left_window: WindowDefinition | None = None
        self.right_window: WindowDefinition | None = None
        self.other: DataFrame | None = None
        self.left_ts: str | None = None
        self.right_ts: str | None = None

    def setup(
        self,
        other: DataFrame,
        left_window: WindowDefinition,
        right_window: WindowDefinition,
        left_ts: str = "timestamp",
        right_ts: str = "timestamp",
    ) -> "ThetaJoin":
        self.other = other
        self.left_window = left_window
        self.right_window = right_window
        self.left_ts = left_ts
        self.right_ts = right_ts
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        if self.other is None:
            raise ValueError("ThetaJoin.setup(...) not called")
        pred = None
        if self.predicate is not None:
            # resolve against the concatenated schema
            both = TupleSchema(
                [BasicType.Long] * (len(df.columns) + len(self.other.columns)),
                names=list(df.columns) + list(self.other.columns),
            )
            pred = self.predicate.compile(both)
        band = max(self.left_window.size, self.right_window.size)
        return theta_join(
            df, self.other, pred, self.left_ts, self.right_ts, max_delta_sec=band
        )
