"""As-of join — an operator Spark lacks natively (SURVEY C17).

Implemented as a composition of built-in ops (preference (a) of the build
rules): union both sides with a kind marker, one hash-shuffle on the join
key, per-key sort by (ts, kind), and a running ``last(value, ignorenulls)``
window. Exactly one shuffle + one sort — no O(left×right) pair blow-up, no
Python in the hot path. This is the plan a 100 TB backfill wants; a
``pd.merge_asof``-per-group ``applyInPandas`` would ship every byte through
Arrow instead.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` (tests + queries/asofq.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (direction='backward') per ``on`` key.

    Matches ``ASOF LEFT JOIN ... ON l.on = r.on AND l.ts >= r.ts``.
    ``value_cols`` are the right-side columns to carry (default: right_ts
    only, exposed as ``asof_<right_ts>``).
    """
    if direction != "backward":
        raise NotImplementedError("forward as-of: flip the sort order")
    value_cols = value_cols if value_cols is not None else []

    carried = [F.col(right_ts).alias(f"asof_{right_ts}")] + [
        F.col(c).alias(f"asof_{c}") for c in value_cols
    ]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        *carried,
    )
    null_carried = [
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"asof_{right_ts}")
    ] + [
        F.lit(None).cast(right.schema[c].dataType).alias(f"asof_{c}")
        for c in value_cols
    ]
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_kind"),
        *null_carried,
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at equal ts (_kind 0 < 1), so an
    # exactly-simultaneous right row IS visible to the left row (>= semantics)
    w = (
        W.partitionBy(on)
        .orderBy("_ts", "_kind")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"asof_{c}", ignorenulls=True)
            .over(w)
            .alias(f"_filled_{c}")
            for c in [right_ts] + value_cols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_filled_{c}").alias(f"asof_{c}") for c in [right_ts] + value_cols
    ]
    return filled.filter(F.col("_kind") == 1).select(*out_cols)
