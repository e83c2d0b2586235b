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
    ``right_ts <= left_ts`` (direction='backward') or the smallest
    ``right_ts >= left_ts`` (direction='forward') per ``on`` key.

    Matches ``ASOF LEFT JOIN ... ON l.on = r.on AND l.ts >= r.ts`` (or
    ``l.ts <= r.ts`` forward). ``value_cols`` are the right-side columns
    to carry (default: right_ts only, exposed as ``asof_<right_ts>``).
    Both directions are the same single-shuffle plan; only the tie order
    and the window frame flip.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    value_cols = value_cols if value_cols is not None else []

    carried = [F.col(right_ts).alias(f"asof_{right_ts}")] + [
        F.col(c).alias(f"asof_{c}") for c in value_cols
    ]
    # tie order makes an exactly-simultaneous right row visible to the
    # left row in BOTH directions: backward scans a preceding frame, so
    # right must sort first at equal ts; forward scans a following frame,
    # so right must sort last.
    right_kind = 0 if direction == "backward" else 1
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(right_kind).alias("_kind"),
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
        F.lit(1 - right_kind).alias("_kind"),
        *null_carried,
    )
    u = l.unionByName(r, allowMissingColumns=True)

    base = W.partitionBy(on).orderBy("_ts", "_kind")
    if direction == "backward":
        w = base.rowsBetween(W.unboundedPreceding, 0)
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
    else:
        w = base.rowsBetween(0, W.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    filled = u.select(
        "*",
        *[
            pick(f"asof_{c}").over(w).alias(f"_filled_{c}")
            for c in [right_ts] + value_cols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_filled_{c}").alias(f"asof_{c}") for c in [right_ts] + value_cols
    ]
    return filled.filter(F.col("_kind") == 1 - right_kind).select(*out_cols)
