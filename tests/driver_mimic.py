"""Driver-canonicalization mimic (SURVEY.md §5.2.1 hardening).

The verification driver compares Spark results to DuckDB oracle results
through *pandas* frames: ``spark_df.toPandas()`` on one side, DuckDB's
``.df()`` on the other, columns sorted by name, rows sorted by all
columns, values hashed. That pipeline has failure modes the repo's own
``tests/oracle.py`` harness (which stringifies cells before comparing)
does not:

- raw ``array``/``map`` output columns arrive as Python lists/dicts —
  unhashable, pandas ``sort_values`` crashes (round-3 q43 failure);
- wide ``DECIMAL(38,x)`` columns arrive as ``decimal.Decimal`` objects
  from Spark but ``float64`` from DuckDB — same value, different
  rendering, hash mismatch (round-3 q76/q77 failure).

This module reproduces that pipeline so the local sweep fails exactly
where the driver would. Every registry entry must pass BOTH harnesses.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import pandas as pd


def hazards(spark_df) -> list[str]:
    """Output-schema constructs known to diverge under pandas
    canonicalization. Registry entries must emit none of these: flatten
    arrays (``array_join``/``explode``), widen structs, and round wide
    decimals through ``ROUND(CAST(x AS DOUBLE), 4)`` at the output
    boundary instead.
    """
    from pyspark.sql import types as T

    out = []
    for f in spark_df.schema.fields:
        dt = f.dataType
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            out.append(f"{f.name}: {dt.simpleString()} (unhashable in pandas)")
        elif isinstance(dt, T.DecimalType):
            # ANY decimal, not just wide ones: Spark toPandas yields
            # Decimal objects at every precision while DuckDB's .df()
            # yields float64 (u08 round-4 sweep finding)
            out.append(
                f"{f.name}: {dt.simpleString()} "
                "(Decimal-object vs float64 rendering drift)"
            )
        elif isinstance(dt, T.BinaryType):
            out.append(f"{f.name}: binary (bytes vs memoryview drift)")
    return out


def _cell(v: Any) -> str:
    """Value rendering after the driver's pandas round-trip.

    Floats round to 4 (the one normalization the driver is known to
    apply); Decimals deliberately do NOT get float treatment — they
    stringify as-is, which is precisely the q76/q77 drift this mimic
    exists to surface.
    """
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (float,)):
        r = round(float(v), 4)
        if r == 0:
            r = 0.0
        return f"{r:.4f}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _canon_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """The driver's canonical form: columns sorted by name, then
    ``sort_values`` over ALL columns (raises TypeError on list cells —
    intentionally not caught), then per-cell rendering.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return [tuple(_cell(v) for v in row) for row in df.itertuples(index=False)]


def compare_driver_style(spark_df, con, oracle_sql: str) -> dict:
    """Mimic the driver's comparison; report['ok'] is the verdict."""
    report: dict[str, Any] = {"ok": False, "hazards": hazards(spark_df)}
    try:
        sp = spark_df.toPandas()
        du = con.execute(oracle_sql).df()
    except Exception as exc:  # driver records these as err rows
        report["error"] = f"build: {type(exc).__name__}: {exc}"
        return report

    report["spark_rows"] = len(sp)
    report["duck_rows"] = len(du)
    if sorted(sp.columns) != sorted(du.columns):
        report["error"] = (
            f"column mismatch: {sorted(sp.columns)} vs {sorted(du.columns)}"
        )
        return report
    if len(sp) != len(du):
        report["error"] = "row count mismatch"
        return report
    try:
        a = _canon_frame(sp)
        b = _canon_frame(du)
    except TypeError as exc:  # unhashable list cell — the q43 class
        report["error"] = f"canonicalize: {exc}"
        return report
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        report["error"] = f"value mismatch ({len(diffs)} rows differ)"
        report["first_diffs"] = diffs[:3]
        return report
    if report["hazards"]:
        report["error"] = f"schema hazards: {report['hazards']}"
        return report
    report["ok"] = True
    return report
