"""DuckDB differential-oracle harness (SURVEY.md §5.2.1).

Runs a registered QuerySpec through Spark and its oracle SQL through DuckDB
on the same parquet files, canonicalizes both results (sorted rows, doubles
rounded to 4, ISO timestamps) and diffs them. Mirrors the verification
driver's check: row count + schema + order-insensitive value comparison.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb

from final_project_big_data_spark.schemas import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 4)
        if r == 0:
            r = 0.0  # normalize -0.0
        return f"{r:.4f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonicalize(rows: list[tuple], colnames: list[str]) -> list[tuple[str, ...]]:
    """Sort columns by name (driver convention), canonicalize cells, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> dict:
    """Return a diff report dict; report['ok'] is the verdict."""
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    duck = con.execute(oracle_sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    report: dict[str, Any] = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
        "ok": False,
    }
    if sorted(spark_cols) != sorted(duck_cols):
        report["error"] = "column name mismatch"
        return report
    if len(spark_rows) != len(duck_rows):
        report["error"] = "row count mismatch"
        return report

    a = canonicalize(spark_rows, spark_cols)
    b = canonicalize(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        report["error"] = f"value mismatch ({len(diffs)} rows differ)"
        report["first_diffs"] = diffs[:5]
        return report
    report["ok"] = True
    return report
