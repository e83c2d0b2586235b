"""Embedding dot product — shared, measured, deliberately the HOF fold.

``dot_fold`` is the engine's one dot-product implementation (s01/s02/s03
similarity, d06/d10 embedding dedup):

    aggregate(zip_with(x, y, (p, q) -> p*q), 0.0, (acc, z) -> acc + z)

It adds strictly left-to-right from a 0.0 seed, which is the exact
accumulation order of DuckDB's ``list_dot_product`` — the bit-equality
the value-hash oracles rest on.

Two "faster" alternatives were built and benchmarked (round 4, sf0.1
s01 brute-force scoring, min-of-5 noop-sink wall-clock) and REJECTED:

- **Unrolled expression** ``0.0 + x[0]*y[0] + ... + x[63]*y[63]``
  (with either a pre-cast array or per-element casts): 0.91 s vs the
  fold's 0.33 s — ~3× SLOWER. The 64-term ``GetArrayItem`` chain blows
  past codegen's expression budget and falls back to interpreted eval
  of a ~260-node tree per pair, which loses to the HOF evaluator's
  tight per-element loop.
- **Arrow-batched NumPy matmul** (``mapInArrow``, probes broadcast,
  one BLAS GEMM per corpus batch): 0.335 s — a wash at local bench
  scale, because Arrow serialization of the corpus vectors costs what
  BLAS saves; it also needs an executor-side probe side-input, which
  breaks the all-builders-are-lazy contract (tests/test_lazy_build.py).

At 100 TB the calculus changes — a corpus-scan ANN over billions of
vectors wants the GEMM — but that is s02/s03's bucketed-candidate
territory anyway; the brute-force s01 exists as the exact,
oracle-anchored baseline, and for its role the fold is both correct
and (locally) fastest.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_fold(x: Column, y: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns;
    bit-identical to DuckDB ``list_dot_product``."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
