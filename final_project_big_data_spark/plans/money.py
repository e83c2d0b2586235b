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


def money_sum(col: Column | str, scale: int = 4) -> Column:
    """Exact order-independent SUM of a fixed-point money expression.

    Returns a double column: ``sum(round(col*10^scale) as long)/10^scale``.
    ``col`` may be any expression whose true values have <= ``scale``
    decimal digits (see module docstring for the exactness argument and
    the 2^63 volume bound).
    """
    c = F.col(col) if isinstance(col, str) else col
    p = 10**scale
    return F.sum(F.round(c * p).cast("long")) / F.lit(float(p))


def money_sum_sql(expr: str, scale: int = 4) -> str:
    """DuckDB-side mirror of :func:`money_sum` (same quantize/sum/divide).

    Cast down to BIGINT explicitly: DuckDB would otherwise widen the sum
    to HUGEINT/DECIMAL and the division result type could drift from
    Spark's long/double → double. The divisor is ``CAST(p AS DOUBLE)``,
    not the literal ``10000.0`` — Spark SQL parses decimal-point literals
    as DECIMAL, which would drag the whole division into decimal typing
    when this text runs through the SQL entry point (the oracle strings
    are written in the Spark∩DuckDB shared dialect and MUST type
    identically in both).
    """
    p = 10**scale
    return (
        f"sum(CAST(round(({expr}) * {p}) AS BIGINT)) / CAST({p} AS DOUBLE)"
    )
