"""Reference-shaped query DSL.

A thin Python mirror of the reference's CQL-style operator algebra
(``src/cql/``) that **compiles to DataFrame plans** — the reference
JIT-compiles fused C++ kernels (``OperatorJit.cpp:240``); here the same
declarations become Catalyst logical plans and whole-stage codegen does
the fusion (SURVEY.md §4).

A user of the reference writes::

    Selection(ComparisonPredicate(EQ, ColumnReference(4), IntConstant(3)))
    Aggregation(WindowDefinition(RANGE_BASED, 60, 1), [SUM], [ColumnReference(8)], [ColumnReference(1)])

and the same shapes work here, with names instead of bare ordinals also
allowed everywhere.
"""

from lightsaber_spark.dsl.schema import TupleSchema, BasicType
from lightsaber_spark.dsl.windows import WindowDefinition, WindowMeasure, WindowType
from lightsaber_spark.dsl.expressions import (
    ColumnReference,
    IntConstant,
    LongConstant,
    FloatConstant,
    DoubleConstant,
    StringConstant,
    Addition,
    Subtraction,
    Multiplication,
    Division,
)
from lightsaber_spark.dsl.predicates import (
    ComparisonPredicate,
    ANDPredicate,
    ORPredicate,
    EQ, NE, LT, LE, GT, GE,
)
from lightsaber_spark.dsl.operators import (
    Selection,
    Projection,
    Aggregation,
    AggregationType,
    HavingClause,
    PostWindowOperation,
    StaticHashJoin,
    ThetaJoin,
    NoOp,
)
from lightsaber_spark.dsl.query import Query, QueryApplication

__all__ = [
    "TupleSchema", "BasicType",
    "WindowDefinition", "WindowMeasure", "WindowType",
    "ColumnReference", "IntConstant", "LongConstant", "FloatConstant",
    "DoubleConstant", "StringConstant",
    "Addition", "Subtraction", "Multiplication", "Division",
    "ComparisonPredicate", "ANDPredicate", "ORPredicate",
    "EQ", "NE", "LT", "LE", "GT", "GE",
    "Selection", "Projection", "Aggregation", "AggregationType",
    "HavingClause", "PostWindowOperation", "StaticHashJoin", "ThetaJoin", "NoOp",
    "Query", "QueryApplication",
]
