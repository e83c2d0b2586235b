"""Driver contract for the spark-graft builder (PySpark target).

Re-exports the engine's query registry
(``final_project_big_data_spark.queries``): every registered QuerySpec
becomes a ``queries()`` entry, and its DuckDB oracle SQL (where
SQL-expressible) becomes the matching ``oracle_sql()`` entry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from final_project_big_data_spark.queries import all_specs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-shape hash aggregate over lineitem (SURVEY.md §7.1's minimum
    end-to-end slice).
    """
    specs = all_specs()
    return specs["q15_hash_aggregate"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
