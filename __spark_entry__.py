"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``confluent_kafka_streams_examples_spark``
(queries.py holds the registry; operators/sources/functions/streaming
hold the engine).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from confluent_kafka_streams_examples_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    regional_revenue: broadcast-enriched star join + aggregation —
    the plan shape that must hold at 100 TB (fact side never shuffles
    for dimension joins; single partial-agg shuffle at the end).
    """
    return QUERIES["regional_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get the
    driver's weaker rows-only check — used only for genuinely
    non-SQL-expressible ops)."""
    return dict(ORACLES)
