"""Expression algebra → pyspark Columns.

Reference surface (SURVEY.md §2.2, the *entire* scalar surface):
``ColumnReference`` (``src/cql/expressions/ColumnReference.h:10-42``),
four typed constants (``{Int,Long,Float,LongLong}Constant.h``), and four
binary arithmetic ops
(``src/cql/expressions/operations/{Addition,Subtraction,Multiplication,
Division}.h``). Compilation target is ``pyspark.sql.Column`` — Catalyst
constant-folds and codegens these, replacing the reference's C++ text
emission.

Columns may be referenced by ordinal (reference style,
``ColumnReference(4)``) or by name (``ColumnReference("cpu")``); ordinal
resolution needs the schema, supplied at compile time.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from lightsaber_spark.dsl.schema import TupleSchema


class Expression:
    def compile(self, schema: TupleSchema | None = None) -> Column:
        raise NotImplementedError

    # arithmetic sugar so DSL trees compose like the reference's ctors
    def __add__(self, other: "Expression") -> "Addition":
        return Addition(self, other)

    def __sub__(self, other: "Expression") -> "Subtraction":
        return Subtraction(self, other)

    def __mul__(self, other: "Expression") -> "Multiplication":
        return Multiplication(self, other)

    def __truediv__(self, other: "Expression") -> "Division":
        return Division(self, other)


class ColumnReference(Expression):
    """Reference: ``ColumnReference(int column, BasicType)`` — ordinal
    addressing (``ColumnReference.h:10-13``); name addressing added."""

    def __init__(self, column: int | str, name: str | None = None) -> None:
        self.column = column
        self.name = name

    def resolved_name(self, schema: TupleSchema | None) -> str:
        if isinstance(self.column, str):
            return self.column
        if schema is None:
            raise ValueError(f"ordinal ColumnReference({self.column}) needs a schema")
        return schema.attribute_name(self.column)

    def compile(self, schema: TupleSchema | None = None) -> Column:
        return F.col(self.resolved_name(schema))


class _Constant(Expression):
    _cast: str | None = None

    def __init__(self, value) -> None:
        self.value = value

    def compile(self, schema: TupleSchema | None = None) -> Column:
        c = F.lit(self.value)
        return c.cast(self._cast) if self._cast else c


class IntConstant(_Constant):
    _cast = "int"


class LongConstant(_Constant):
    _cast = "bigint"


class FloatConstant(_Constant):
    _cast = "float"


class DoubleConstant(_Constant):
    _cast = "double"


class StringConstant(_Constant):
    _cast = None


class LongLongConstant(_Constant):
    """128-bit constant (``LongLongConstant.h``) → DecimalType(38,0)."""

    _cast = "decimal(38,0)"


class _BinaryOp(Expression):
    _symbol = "?"

    def __init__(self, left: Expression, right: Expression) -> None:
        self.left = left
        self.right = right

    def _apply(self, l: Column, r: Column) -> Column:
        raise NotImplementedError

    def compile(self, schema: TupleSchema | None = None) -> Column:
        return self._apply(self.left.compile(schema), self.right.compile(schema))


class Addition(_BinaryOp):
    _symbol = "+"

    def _apply(self, l, r):
        return l + r


class Subtraction(_BinaryOp):
    _symbol = "-"

    def _apply(self, l, r):
        return l - r


class Multiplication(_BinaryOp):
    _symbol = "*"

    def _apply(self, l, r):
        return l * r


class Division(_BinaryOp):
    """Reference division is C-semantics: int/int truncates
    (generated C++ ``/`` on ints — e.g. LRB1's ``position/5280``,
    ``test/.../LinearRoadBenchmark/LRB1.cpp:23``). Spark's ``/`` is
    always double division, so integer operands go through ``div``."""

    _symbol = "/"

    def __init__(self, left, right, integer: bool | None = None) -> None:
        super().__init__(left, right)
        self.integer = integer

    def compile(self, schema: TupleSchema | None = None) -> Column:
        l, r = self.left.compile(schema), self.right.compile(schema)
        integer = self.integer
        if integer is None:
            integer = isinstance(self.right, (IntConstant, LongConstant)) and isinstance(
                self.left, (ColumnReference, IntConstant, LongConstant, Addition,
                            Subtraction, Multiplication, Division)
            ) and not isinstance(self.left, (FloatConstant, DoubleConstant))
        if integer:
            # truncation toward zero, matching generated C++ `/` on ints
            # (Spark % follows the dividend sign like C, so (l - l%r)/r
            # is the truncated quotient, exact in integer space)
            li, ri = l.cast("bigint"), r.cast("bigint")
            return ((li - (li % ri)) / ri).cast("bigint")
        return l / r

    def _apply(self, l, r):  # pragma: no cover - compile() overridden
        return l / r
