"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`storage_crawler_spark.plans.registry` — the engine's
query catalog.  Each registry entry pairs a Spark builder with the DuckDB
oracle SQL the driver uses for the correctness gate; entries without an
oracle (custom pandas-UDF operators) get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from storage_crawler_spark.plans.registry import get_query

    return get_query("tpch_q1_pricing_summary").builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.9)."""
    from storage_crawler_spark.plans.registry import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for pandas-UDF-backed
    operators, which the driver checks rows-only)."""
    from storage_crawler_spark.plans.registry import oracle_map

    return oracle_map()
