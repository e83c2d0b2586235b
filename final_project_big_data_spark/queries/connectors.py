"""Custom-connector driver entries (Python Data Source API surface).

x04 reads through the ``synthdocs`` Python data source — a real
``spark.read.format(...)`` connector with partition-planned parallel
reads — and the DuckDB oracle regrows the identical rows from the
closed form, so the whole connector path (plan → per-partition read →
Arrow transfer → downstream exprs) is value-hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from final_project_big_data_spark.queries import query
from final_project_big_data_spark.sources.pydatasource import register_sources

_N_DOCS = 500
_N_PARTS = 8


@query(
    "x04_python_datasource",
    oracle=f"""
    SELECT range AS doc_id,
           CAST(range % 4 AS INT) AS shard,
           'w' || CAST(range % 7 AS VARCHAR)
           || ' w' || CAST((range * 3) % 11 AS VARCHAR)
           || ' w' || CAST((range * 7) % 13 AS VARCHAR) AS text,
           CAST(3 AS INT) AS n_tokens
    FROM range({_N_DOCS}) ORDER BY doc_id
    """,
    category="source",
)
def x04(spark: SparkSession, sf: str) -> DataFrame:
    """Read via the custom ``synthdocs`` Python data source (8 planned
    input partitions → 8 parallel executor reads; see
    ``sources/pydatasource.py``) with a downstream JVM-side expression on
    top — the oracle recomputes every row from the source's closed form.
    """
    register_sources(spark)
    d = (
        spark.read.format("synthdocs")
        .option("n", _N_DOCS)
        .option("partitions", _N_PARTS)
        .load()
    )
    return d.select(
        "doc_id",
        "shard",
        "text",
        F.size(F.split("text", " ")).alias("n_tokens"),
    ).orderBy("doc_id")
