"""Cross-engine-deterministic rounding at the output boundary.

``ROUND(double, n)`` is NOT portable at half-way points: Spark converts
the double to a BigDecimal via its shortest decimal representation and
rounds that HALF_UP, while DuckDB rounds the binary value — so a double
whose shortest repr ends in ...5 (e.g. 1257.85775) rounds UP in Spark
and DOWN in DuckDB even though both engines hold the bit-identical
double. Found live: q96 at sf0.1 (two rows off by 1 in the 4th
decimal); q65's DECIMAL story is the same disease on a different organ.

``round_half_up`` sidesteps the decimal-repr divergence by rounding in
pure IEEE double arithmetic:

    floor(x * 10^n + 0.5) / 10^n

Multiplication, addition, floor and division are bit-deterministic in
every engine, so BOTH sides of an oracle pair compute the identical
double — which is all hash parity needs. (On exact binary half-cases
this is round-half-toward-+inf rather than half-away-from-zero for
negatives; the POINT is that both engines agree, not which convention
wins.) The matching oracle-side SQL is ``round_half_up_sql``.

Use this instead of ``F.round`` whenever the rounded value is an
arbitrary-precision double (raw measures, divisions, averages); plain
``ROUND`` stays fine for values that are decimal-exact by construction
(prices with 2-digit cents, already-quantized centroids).

Magnitude bound: once ``|x| * 10^scale`` exceeds 2^53, doubles no longer
resolve unit steps — ``x*p + 0.5`` collapses to ``x*p`` and the "round"
silently becomes a truncation-of-nothing (still bit-identical across
engines, so hash parity survives, but it is no longer rounding). At
scale=4 that's |x| > ~9e11; every current caller rounds per-row measures
or per-group unit costs far below it. Callers rounding SUMS at cluster
scale should bound the magnitude first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column | str, scale: int = 4) -> Column:
    """Engine-portable round-to-``scale`` via pure double arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10**scale))
    return F.floor(c * p + F.lit(0.5)) / p


def round_half_up_sql(expr: str, scale: int = 4) -> str:
    """DuckDB-side mirror of :func:`round_half_up` (same IEEE ops).

    Constants are ``CAST(n AS DOUBLE)`` rather than decimal-point
    literals: Spark SQL types ``10000.0`` as DECIMAL, so the bare form
    would silently change typing if the text ever runs through the SQL
    entry point (the shared-dialect rule; value-identical on DuckDB).
    """
    p = 10**scale
    return (
        f"floor(({expr}) * {p} + CAST(0.5 AS DOUBLE)) / CAST({p} AS DOUBLE)"
    )
