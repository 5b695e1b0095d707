"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator inventory (SURVEY.md §2) with DuckDB
oracle twins, backed by ``spatial_data_engineering_spark.queries_registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spatial_data_engineering_spark.plans.flagship import flagship_report

    return flagship_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spatial_data_engineering_spark.queries_registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from spatial_data_engineering_spark.queries_registry import all_oracles

    return all_oracles()
