"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over :mod:`lightsaber_spark.queries` — the canonical query
catalog (SURVEY.md §2/§5 parity queries + beyond-parity pipeline ops),
each with a DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (CM1 analog: sliding windowed sum, pane-optimized)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from lightsaber_spark.queries import SPARK_QUERIES

    return SPARK_QUERIES["cm1_sliding_sum_by_type"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import lightsaber_spark.pipeline_queries  # noqa: F401 — registers entries
    from lightsaber_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    import lightsaber_spark.pipeline_queries  # noqa: F401 — registers entries
    from lightsaber_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
