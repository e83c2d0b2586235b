"""Exact-DECIMAL cross-engine parity (ADVICE r3, q65 follow-up).

q65's driver-facing output was moved to ``ROUND(CAST(· AS DOUBLE), 4)``
because the verification driver's pandas canonicalizer renders wide
DECIMAL columns differently per engine (CORRECTNESS_r03 q76/q77) — but
that rounding abandoned the parity claim the entry existed to pin: that
DECIMAL accumulation is bit-exact across Spark and DuckDB.

This test restores the exact assertion at the layer ADVICE suggested —
the comparison layer — by fetching the UNROUNDED aggregate on both
engines as ``decimal.Decimal`` objects and comparing them with Decimal
equality (scale-normalizing, no float anywhere). The driver-facing query
keeps its rounded-double projection; the exactness lives here.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table


def test_decimal_sum_exact_across_engines(spark, sf_dir, duck):
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    got = {
        r["l_returnflag"]: (r["sum_price"], r["sum_disc_price"])
        for r in (
            li.groupBy("l_returnflag")
            .agg(
                F.sum(price).alias("sum_price"),
                F.sum(price * disc).alias("sum_disc_price"),
            )
            .collect()
        )
    }
    want = {
        flag: (p, dp)
        for flag, p, dp in duck.execute(
            """
            SELECT l_returnflag,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,4))),
                   SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(1 - l_discount AS DECIMAL(18,4)))
            FROM lineitem GROUP BY l_returnflag
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for flag in got:
        for g, w in zip(got[flag], want[flag]):
            assert isinstance(g, Decimal) and isinstance(w, Decimal)
            # Decimal __eq__ is scale-normalizing: 1.10 == 1.1 exactly,
            # 1.1000000001 != 1.1 — the exact-parity assert we want.
            assert g == w, f"{flag}: spark {g} != duckdb {w}"
