"""Morton/Z-order interleave — the clustering key behind q104 and
``io.write_zordered``. Lives in operators/ (not queries/) so the IO
layer can use it without importing the query registry.

Pure JVM bit arithmetic (shiftleft/shiftright/AND/OR): whole-stage
codegen'd, no shuffle, no UDF. The DuckDB twin (`zvalue_sql`) unrolls
the same interleave so oracles compute z-values independently.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

Z_BITS = 16  # bits interleaved per dimension (32-bit z-values)


def zvalue(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Z-order interleave of the low ``bits`` bits of two non-negative
    integer columns: bit i of x lands at position 2i, bit i of y at
    2i+1. Keys wider than ``bits`` bits wrap (masked), which degrades
    clustering quality but never correctness."""
    xm = x.bitwiseAND(F.lit((1 << bits) - 1)).cast("long")
    ym = y.bitwiseAND(F.lit((1 << bits) - 1)).cast("long")
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zvalue_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """The same interleave as :func:`zvalue`, unrolled to DuckDB bit
    operators."""
    xm = f"(CAST({x} AS BIGINT) & {(1 << bits) - 1})"
    ym = f"(CAST({y} AS BIGINT) & {(1 << bits) - 1})"
    parts = []
    for i in range(bits):
        parts.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"
