"""Distributed EXACT interpolated quantiles (quantile_cont semantics).

Why this exists (round 6, found by the 1000× registry sweep): Spark's
built-in exact ``percentile`` / ``median`` is an object-based aggregate
whose buffer is a counts-map keyed by VALUE. The round-5 docstring claim
"holds at scale because group count bounds the reduce side" was wrong —
group count bounds the reduce TASK count, but each task's buffer grows
with the number of DISTINCT VALUES in its groups, and the final merge
folds every map-side partial map into one. At the 1000× probe (600M
lineitem rows, 3 groups) q56 ground for >20 minutes at 85%+ old-gen
occupancy with hundreds of full GCs before being killed: a per-group
value buffer is an un-scalable plan shape no matter how it is
parallelized (reference behavior: the reference engine never computes
exact medians at all).

The scalable formulation is counting + a value-domain window:

1. ``groupBy(group, value).count()`` — the ONLY full-data shuffle, a
   plain codegen hash agg with map-side combine; output is one row per
   (group, DISTINCT value).
2. A per-group window ordered by value accumulates running counts
   (``lo``/``hi`` bounds of each value's index range) and the group
   total ``n`` — partition size = distinct values per group, NOT rows.
3. ``quantile_cont(q)`` picks the values covering 0-indexed positions
   ``floor((n-1)q)`` and ``ceil((n-1)q)`` with a conditional max — one
   more tiny agg — and interpolates ``lo_v + (hi_v - lo_v) * frac``,
   the same IEEE expression DuckDB's Interpolator evaluates, so oracle
   hash parity is preserved bit-for-bit.

Memory is bounded by distinct values per group at every stage; all
operators are whole-stage-codegen hash aggs and a window whose
partitions hold (group, value, count) triples only. The approximate
path for genuinely continuous 100 TB columns remains
``percentile_approx`` (C02/a02) — this operator is the exact path that
the reference's test queries (q42, q56) require.

GLOBAL case (empty ``group_cols``, reworked round 8): a no-key
``Window.partitionBy()`` would put every distinct value into ONE window
partition on one task — the round-6 docstring documented that bound;
round 8 removed it. The running count over the value order is an
exclusive prefix sum, so the global path now routes through
``indexing.with_prefix_sum`` (range exchange + per-partition offsets +
broadcast 1-row total): the memory bound is "distinct values per
PARTITION" at every stage, grouped or global. The routing rule to
``percentile_approx`` remains for genuinely continuous 100 TB columns —
exactness over a counting formulation still costs a full shuffle of the
distinct domain, and a sketch is the right trade when the domain is the
row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def exact_quantile_cont(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: dict[str, float],
) -> DataFrame:
    """Exact interpolated quantiles of ``value_col`` per ``group_cols``.

    ``qs`` maps output column name → quantile in [0, 1]. Returns one row
    per group with the requested quantile columns (NULL-valued inputs are
    excluded, matching SQL ``quantile_cont``/``percentile`` semantics).
    """
    v = F.col(value_col)
    vc = (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    if group_cols:
        wv = W.partitionBy(*group_cols).orderBy(value_col)
        wg = W.partitionBy(*group_cols)
        ranked = (
            vc.withColumn("_hi", F.sum("_c").over(wv))
            .withColumn("_lo", F.col("_hi") - F.col("_c"))
            .withColumn("_n", F.sum("_c").over(wg))
        )
    else:
        # GLOBAL case (round 8, closing the round-6 docstring caveat):
        # Window.partitionBy() with no keys would buffer and sort ALL
        # distinct values in ONE task. The running count is just an
        # exclusive prefix sum over the value order — route it through
        # the distributed two-pass prefix-sum (indexing.with_prefix_sum:
        # range exchange + per-partition offsets), so the bound is
        # "distinct values per PARTITION" everywhere; the total rides a
        # 1-row broadcast. Identical _lo/_hi/_n values to the window
        # spelling — only the plan shape changes.
        from final_project_big_data_spark.operators.indexing import (
            with_prefix_sum,
        )

        total = vc.groupBy().agg(F.sum("_c").alias("_n"))
        ranked = (
            with_prefix_sum(vc, [value_col], "_c", "_lo")
            .withColumn("_hi", F.col("_lo") + F.col("_c"))
            .crossJoin(F.broadcast(total))
        )
    aggs: list[Column] = []
    for name, q in qs.items():
        # 0-indexed fractional position, the quantile_cont convention
        pos = (F.col("_n") - 1) * F.lit(float(q))
        i_lo = F.floor(pos)
        i_hi = F.ceil(pos)
        frac = pos - i_lo
        v_lo = F.max(
            F.when((F.col("_lo") <= i_lo) & (i_lo < F.col("_hi")), v)
        )
        v_hi = F.max(
            F.when((F.col("_lo") <= i_hi) & (i_hi < F.col("_hi")), v)
        )
        # DuckDB's Interpolator form: lo + (hi - lo) * frac. frac is
        # constant within a group; max() just carries it through.
        aggs.append(
            (v_lo + (v_hi - v_lo) * F.max(frac)).alias(name)
        )
    return ranked.groupBy(*group_cols).agg(*aggs)
