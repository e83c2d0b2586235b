"""Query registry — the engine's declared, oracle-checked contract.

Every operator from SURVEY.md §2.4 registers here as a ``QuerySpec``:
a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent DuckDB oracle SQL string run on the same
parquet files. ``__spark_entry__.py`` re-exports this registry to the
verification driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only check (non-SQL op)
    category: str


SPECS: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, category: str = "") -> Callable:
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        SPECS[name] = QuerySpec(name=name, builder=fn, oracle=oracle, category=category)
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return SPECS."""
    from final_project_big_data_spark.queries import (  # noqa: F401
        approx,
        asofq,
        connectors,
        curation,
        dedup,
        dedup_text,
        eventflow,
        layout,
        mlq,
        mmq,
        relational,
        similarity,
        stats,
        streamlike,
        scalar_extras,
        subqueries,
        textops,
        tpch_shapes,
        udfs,
        warehouse,
    )

    return SPECS
