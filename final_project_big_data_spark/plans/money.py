"""Exact, order-independent money sums via unscaled-BIGINT accumulation.

The problem (found by the 10x-volume sweep, round 4): double partial
sums of money expressions drift in the 4th decimal BETWEEN ENGINES once
group sums reach ~5e10 — float addition is not associative, and Spark's
partial/final aggregation order differs from DuckDB's single-threaded
fold. Round 4 fixed it by accumulating in DECIMAL(18,4), which is exact
but cost q15 +92% on the headline bench (Spark's Decimal aggregate
buffer is object-based, outside the primitive codegen fast path).

This module is the round-5 recovery (VERDICT r4 item 3): quantize each
term to its unscaled integer representation up front —

    sum(CAST(round(x * 10^scale) AS BIGINT)) / 10^scale

- ``round(x * 10^scale)`` is EXACT per row whenever x is a fixed-point
  value with <= ``scale`` decimal digits (every money column in the
  schema carries 2-digit cents; products with 2-digit discount factors
  have <= 4): the true product is an integer, the double lands within
  ~1e-7 of it, and both engines round to the identical integer.
- the BIGINT sum is exact and order-independent — partial aggregation,
  shuffle order, and thread count cannot move it — and stays on the
  primitive long accumulation path inside whole-stage codegen
  (measured: recovers the DECIMAL regression, see SCALE.md).
- the final ``/ 10^scale`` produces the same double on both engines
  from the same exact integer.

Volume bound (documented, not silent): the accumulator overflows at
2^63-1 ≈ 9.2e18 unscaled units. At scale=4 with ~1e9-unit rows (TPC-H
prices), that is ~9e9 rows PER GROUP — roughly TPC-H sf1500 landing in
one aggregation group. The 100x local probe peaks near 6e16 (300x
headroom). Beyond provable bounds, keep DECIMAL(18,4) accumulation
(the q65 path — exact at any scale, slower): Spark wraps silently on
long overflow with ANSI mode off, so this is a pre-flight sizing
decision, not a runtime-detected one.

Ref parity note: the reference engine aggregates doubles naively
(its data plane has no exact-sum machinery at all); this exists because
the ORACLE comparison demands cross-engine bit-equality of rendered
sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from final_project_big_data_spark.plans.rounding import (
    round_half_up,
    round_half_up_sql,
)


def money_units(col: Column | str, scale: int = 4) -> Column:
    """Quantize a fixed-point money expression to exact unscaled BIGINT
    units: ``CAST(round(col * 10^scale) AS LONG)``.

    The shared building block: :func:`money_sum` sums these, and plans
    that need the INTEGER domain itself (q92's argmax-on-aggregate, where
    ties must be exact) aggregate these directly and render at the end.

    Quantization is ``floor(x*10^scale + 0.5)``, NOT ``round(·)``: Spark's
    ROUND on a double routes through a per-row ``BigDecimal.setScale``
    allocation, which round 6 measured at 2.1x the whole aggregate cost of
    q15 (0.385 s → 0.184 s at sf0.1 after the switch). floor(x+0.5) stays
    in primitive double math inside whole-stage codegen and is EXACT for
    this input class: the true product is an integer n, the double x lands
    within ~1e-7 of n, so x+0.5 ∈ (n+0.5-ε, n+0.5+ε) and floors to n on
    both engines (0.5 is a power of two — the add is exact; the two
    functions could only disagree near half-integers, which |x-n|≤ε rules
    out by construction). Holds for negative money too: floor(-n+0.5±ε)
    = -n while ε < 0.5.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**scale) + F.lit(0.5)).cast("long")


def money_units_sql(expr: str, scale: int = 4) -> str:
    """DuckDB/shared-dialect mirror of :func:`money_units` (same
    floor(x+0.5) quantization — see the exactness argument there).

    Cast down to BIGINT explicitly: DuckDB would otherwise widen sums of
    these to HUGEINT/DECIMAL and downstream division types could drift
    from Spark's long/double → double. The 0.5 is CAST(... AS DOUBLE)
    because Spark SQL parses bare decimal-point literals as DECIMAL
    (shared-dialect rule; see :func:`money_from_units_sql`).
    """
    p = 10**scale
    return f"CAST(floor(({expr}) * {p} + CAST(0.5 AS DOUBLE)) AS BIGINT)"


def money_from_units(col: Column | str, scale: int = 4) -> Column:
    """Render unscaled BIGINT units back to a money double.

    The quotient is the nearest double to the exact ``scale``-decimal
    value and is bit-identical on both engines; do NOT wrap it in an
    outer ``round(·, scale)`` — Spark rounds via exact BigDecimal while
    DuckDB computes ``x*10^scale`` in floating point, and the two can
    legally disagree by one ulp once ``|x|*10^scale > 2^53`` (the q65
    drift class, found by the 100x sweep).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c / F.lit(float(10**scale))


def money_from_units_sql(expr: str, scale: int = 4) -> str:
    """Shared-dialect mirror of :func:`money_from_units`.

    The divisor is ``CAST(p AS DOUBLE)``, not the literal ``10000.0`` —
    Spark SQL parses decimal-point literals as DECIMAL, which would drag
    the division into decimal typing when this text runs through the SQL
    entry point (oracle strings are written in the Spark∩DuckDB shared
    dialect and MUST type identically in both).
    """
    return f"({expr}) / CAST({10 ** scale} AS DOUBLE)"


def money_sum(col: Column | str, scale: int = 4) -> Column:
    """Exact order-independent SUM of a fixed-point money expression.

    Returns a double column: ``sum(round(col*10^scale) as long)/10^scale``.
    ``col`` may be any expression whose true values have <= ``scale``
    decimal digits (see module docstring for the exactness argument and
    the 2^63 volume bound). The result is already canonical — never wrap
    it in an outer ``round`` (see :func:`money_from_units`).
    """
    c = F.col(col) if isinstance(col, str) else col
    return money_from_units(F.sum(money_units(c, scale)), scale)


def money_sum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB-side mirror of :func:`money_sum` (same quantize/sum/divide),
    built from the same unit helpers as the Spark column."""
    return money_from_units_sql(f"sum({money_units_sql(expr, scale)})", scale)


def fixed_render(col: Column | str, scale: int = 4) -> Column:
    """Per-row fixed-``scale`` decimal rendering — delegates to
    ``plans.rounding.round_half_up`` (single source of the floor form).

    Use this instead of ``F.round(col, scale)`` in PER-ROW hot paths:
    equal to ROUND for non-half-tie values, but primitive-double codegen
    instead of a per-row ``BigDecimal.setScale`` (round 6: 4 renders over
    sf0.1 lineitem cost ~0.7 s/pass as ROUND vs ~0.02 s as floor form)
    and ulp-stable cross-engine (the q65 drift class). Not for money
    COLUMN values being compared/tied — those go through
    :func:`money_units`; this is output rendering only.
    """
    return round_half_up(col, scale)


def fixed_render_sql(expr: str, scale: int = 4) -> str:
    """Shared-dialect mirror of :func:`fixed_render`."""
    return round_half_up_sql(expr, scale)
