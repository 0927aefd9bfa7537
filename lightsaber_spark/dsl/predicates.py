"""Predicate algebra → boolean pyspark Columns.

Reference (SURVEY.md §2.3): ``ComparisonPredicate`` with op codes
``== != < <= > >=`` (``src/cql/predicates/ComparisonPredicate.h:11-42``,
``Predicate.h:5-10,24-40``) composed with
``ANDPredicate``/``ORPredicate`` (``ANDPredicate.h``/``ORPredicate.h``).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column

from lightsaber_spark.dsl.expressions import Expression
from lightsaber_spark.dsl.schema import TupleSchema

# op codes, mirroring Predicate.h:5-10
EQ, NE, LT, LE, GT, GE = "==", "!=", "<", "<=", ">", ">="


class Predicate:
    def compile(self, schema: TupleSchema | None = None) -> Column:
        raise NotImplementedError


class ComparisonPredicate(Predicate):
    _OPS = {
        EQ: lambda l, r: l == r,
        NE: lambda l, r: l != r,
        LT: lambda l, r: l < r,
        LE: lambda l, r: l <= r,
        GT: lambda l, r: l > r,
        GE: lambda l, r: l >= r,
    }

    def __init__(self, op: str, left: Expression, right: Expression) -> None:
        if op not in self._OPS:
            raise ValueError(f"unknown comparison op {op!r}")
        self.op = op
        self.left = left
        self.right = right

    def compile(self, schema: TupleSchema | None = None) -> Column:
        return self._OPS[self.op](self.left.compile(schema), self.right.compile(schema))


class ANDPredicate(Predicate):
    def __init__(self, predicates: Sequence[Predicate]) -> None:
        self.predicates = list(predicates)

    def compile(self, schema: TupleSchema | None = None) -> Column:
        return reduce(lambda a, b: a & b, (p.compile(schema) for p in self.predicates))


class ORPredicate(Predicate):
    def __init__(self, predicates: Sequence[Predicate]) -> None:
        self.predicates = list(predicates)

    def compile(self, schema: TupleSchema | None = None) -> Column:
        return reduce(lambda a, b: a | b, (p.compile(schema) for p in self.predicates))
