"""Unit tests for plans/money.py — exact unscaled-BIGINT money sums.

The module's contract (SURVEY §7.4 large-magnitude-sum medicine, round-5
refinement): for fixed-point money expressions, ``money_sum`` is
(a) exactly equal to the rational-arithmetic sum, (b) independent of
partitioning / accumulation order, and (c) bit-identical to its DuckDB
mirror ``money_sum_sql``. (a) and (b) are what the DECIMAL(18,4) version
guaranteed; these tests pin that the BIGINT replacement did not trade
them away for the codegen fast path.
"""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from final_project_big_data_spark.plans.money import money_sum, money_sum_sql


def cents(min_units: int = 0, max_units: int = 10_500_000):
    """2-decimal fixed-point doubles (prices): unscaled-cents integers
    rendered as the nearest double, like every money column in the
    fixtures."""
    return st.integers(min_units, max_units).map(lambda u: u / 100.0)


@settings(max_examples=20, deadline=None)
@given(st.lists(cents(), min_size=1, max_size=50))
def test_money_sum_exact_vs_rational(spark, values):
    """sum via money_sum == the exact Fraction sum, to the last decimal."""
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    got = df.agg(money_sum("x").alias("s")).collect()[0]["s"]
    want = sum(Fraction(round(v * 100)) for v in values) / 100
    assert Fraction(Decimal(str(got))) == want


def test_money_sum_partitioning_invariant(spark):
    """The sum is identical at 1, 7 and 32 partitions — integer addition
    is associative; this is the property double sums lose at magnitude."""
    rows = [((i % 997) * 10007 / 100.0,) for i in range(20_000)]
    df = spark.createDataFrame(rows, ["x"])
    sums = {
        df.repartition(n).agg(money_sum("x").alias("s")).collect()[0]["s"]
        for n in (1, 7, 32)
    }
    assert len(sums) == 1, sums


def test_money_sum_product_expression(spark):
    """price*(1-disc) — a 4-decimal product of two 2-decimal values —
    stays exact (the q15/q92 disc_price shape)."""
    rows = [(100.01, 0.05), (99.99, 0.10), (0.03, 0.00), (12345.67, 0.08)]
    df = spark.createDataFrame(rows, ["p", "d"])
    got = df.agg(
        money_sum(F.col("p") * (F.lit(1) - F.col("d"))).alias("s")
    ).collect()[0]["s"]
    want = sum(
        Fraction(round(p * 100)) * (1 - Fraction(round(d * 100), 100))
        for p, d in rows
    ) / 100
    assert Fraction(Decimal(str(got))) == want


def test_money_sum_null_and_when_semantics(spark):
    """NULL terms (the q47 FILTER-as-when shape) are skipped, matching
    SQL SUM; an all-NULL group returns NULL on both sides."""
    rows = [(1.25, True), (2.50, False), (3.25, True)]
    df = spark.createDataFrame(rows, ["x", "keep"])
    got = df.agg(
        money_sum(F.when(F.col("keep"), F.col("x"))).alias("s")
    ).collect()[0]["s"]
    assert got == pytest.approx(4.50, abs=0)
    none = df.agg(
        money_sum(F.when(F.lit(False), F.col("x"))).alias("s")
    ).collect()[0]["s"]
    assert none is None


def test_money_sum_sql_mirror_bit_identical(spark, duck):
    """Spark money_sum and DuckDB money_sum_sql produce the SAME double
    on the same data — including the division typing (CAST(p AS DOUBLE),
    not a decimal-point literal, which Spark SQL would type as DECIMAL)."""
    rows = [((i * 9973 % 1_000_000) / 100.0,) for i in range(5_000)]
    df = spark.createDataFrame(rows, ["x"])
    got = df.agg(money_sum("x").alias("s")).collect()[0]["s"]
    duck.execute("CREATE OR REPLACE TEMPORARY TABLE _money AS "
                 "SELECT * FROM (VALUES " +
                 ",".join(f"({v[0]!r})" for v in rows) + ") t(x)")
    want = duck.execute(
        f"SELECT {money_sum_sql('x')} FROM _money"
    ).fetchone()[0]
    duck.execute("DROP TABLE _money")
    assert got == want  # exact float equality, not approx

    # the same TEXT also runs through spark.sql and types as double
    via_sql = spark.sql(
        f"SELECT {money_sum_sql('x')} AS s FROM {{t}}", t=df
    ).collect()[0]["s"]
    assert isinstance(via_sql, float) and via_sql == got


def test_money_sum_sql_scale_param():
    assert "* 100 " in money_sum_sql("x", scale=2)
    assert "CAST(100 AS DOUBLE)" in money_sum_sql("x", scale=2)


def test_money_units_negative_exact(spark):
    """floor(x*p + 0.5) quantization (round 6) is exact for NEGATIVE money
    too: floor(-n + 0.5 ± ε) = -n while ε < 0.5 (module docstring)."""
    from final_project_big_data_spark.plans.money import money_units

    rows = [(-1.25,), (-0.01,), (2.50,), (-999999.99,)]
    df = spark.createDataFrame(rows, ["x"])
    got = [r.u for r in df.select(money_units("x").alias("u")).collect()]
    assert got == [-12500, -100, 25000, -9999999900]


def test_fixed_render_matches_round_and_duckdb(spark, duck):
    """fixed_render == ROUND(x,4) for non-tie values (math-fn outputs),
    and the SQL mirror is bit-identical on DuckDB — the q33 render path."""
    from final_project_big_data_spark.plans.money import (
        fixed_render,
        fixed_render_sql,
    )

    rows = [(float(i),) for i in range(2, 500)]
    df = spark.createDataFrame(rows, ["x"])
    got = [
        r.v
        for r in df.select(
            fixed_render(F.sqrt("x")).alias("v")
        ).collect()
    ]
    rounded = [
        r.v for r in df.select(F.round(F.sqrt("x"), 4).alias("v")).collect()
    ]
    assert got == rounded  # sqrt outputs never land on half-integer ties
    duck.execute(
        "CREATE OR REPLACE TEMPORARY TABLE _fr AS SELECT * FROM (VALUES "
        + ",".join(f"({v[0]!r})" for v in rows)
        + ") t(x)"
    )
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT {fixed_render_sql('sqrt(x)')} FROM _fr ORDER BY x"
        ).fetchall()
    ]
    duck.execute("DROP TABLE _fr")
    assert got == want  # exact float equality
