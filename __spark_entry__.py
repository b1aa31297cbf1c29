"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``presto_weather_spark.registry`` — every operator from
SURVEY.md §2 registers there with a Spark callable and (where
SQL-expressible) a DuckDB oracle; this module just re-exports the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from presto_weather_spark import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (current conditions board) on /root/testdata/sf0.001."""
    from presto_weather_spark.flagship import conditions_board

    return conditions_board(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
