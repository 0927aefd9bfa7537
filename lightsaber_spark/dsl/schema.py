"""TupleSchema — the reference's flat, positional schema model.

Reference: ``src/utils/TupleSchema.h:14-31`` — a vector of
(name, AttributeType) pairs with auto-generated names ``atr_i`` and an
implicit leading ``timestamp`` long (``TupleSchema.h:25``:
``hasTimestamp`` defaults true; ``ColumnReference.h:21-24`` renders
column 0 as the timestamp). Types: ``src/utils/AttributeType.h:16``.

Here a TupleSchema maps onto a Spark ``StructType``; the reference's
power-of-two padding (``TupleSchema.h:86-98``) is a circular-buffer
artifact with no Spark meaning and is dropped.
"""

from __future__ import annotations

import enum
from collections.abc import Sequence

from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class BasicType(enum.Enum):
    """Reference type system (``AttributeType.h:16``)."""

    Integer = "Integer"
    Long = "Long"
    Float = "Float"
    Double = "Double"
    Char = "Char"
    Date = "Date"
    String = "String"
    LongLong = "LongLong"  # 128-bit → DecimalType(38,0) (SURVEY §1.6)
    Timestamp = "Timestamp"  # Spark-native extension for event time


_SPARK_TYPES: dict[BasicType, DataType] = {
    BasicType.Integer: IntegerType(),
    BasicType.Long: LongType(),
    BasicType.Float: FloatType(),
    BasicType.Double: DoubleType(),
    BasicType.Char: ByteType(),
    BasicType.Date: DateType(),
    BasicType.String: StringType(),
    BasicType.LongLong: DecimalType(38, 0),
    BasicType.Timestamp: TimestampType(),
}


class TupleSchema:
    """Flat positional schema; column 0 is event time by default.

    ``names`` defaults to the reference's auto names (``atr_i``,
    ``TupleSchema.h:29``) with column 0 called ``timestamp``.
    """

    def __init__(
        self,
        types: Sequence[BasicType],
        names: Sequence[str] | None = None,
        has_timestamp: bool = True,
    ) -> None:
        self.types = list(types)
        self.has_timestamp = has_timestamp
        if names is None:
            names = [
                "timestamp" if (i == 0 and has_timestamp) else f"atr_{i}"
                for i in range(len(types))
            ]
        if len(names) != len(types):
            raise ValueError("names/types length mismatch")
        self.names = list(names)

    def size(self) -> int:
        return len(self.types)

    def attribute_name(self, i: int) -> str:
        return self.names[i]

    def to_struct_type(self) -> StructType:
        return StructType(
            [StructField(n, _SPARK_TYPES[t], True) for n, t in zip(self.names, self.types)]
        )

    def __repr__(self) -> str:  # parity with TupleSchema printing
        cols = ", ".join(f"{n}:{t.value}" for n, t in zip(self.names, self.types))
        return f"TupleSchema({cols})"
