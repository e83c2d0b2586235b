"""Statistical aggregates, exact percentiles, list aggregation, pivot and
null-handling scalars — completeness extensions beyond SURVEY §2.4's
letter queries (same Tier-A conventions: total ORDER BY, ROUND(·,4),
matching column names both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.queries import query


@query(
    "q41_stats_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
           ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
           ROUND(CORR(l_extendedprice, l_quantity), 4) AS corr_pq,
           ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 4) AS covar_pq
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    category="aggregate",
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    """Second-moment aggregates: stddev/variance/corr/covar.

    All four are single-pass, map-side-combinable (sum, sum-of-squares,
    cross-moments) — no extra shuffle beyond the groupBy at any scale.
    """
    return (
        load_table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
            F.round(
                F.covar_samp("l_extendedprice", "l_quantity"), 4
            ).alias("covar_pq"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q42_percentile_exact",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    category="aggregate",
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``).

    Scale note: exact percentile buffers each group's values — correct but
    memory-bound per key; the 100 TB path is a02's sketch
    (``percentile_approx``), declared separately.
    """
    return (
        load_table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(
            *[
                F.round(
                    F.expr(f"percentile(o_totalprice, {q}D)"), 4
                ).alias(name)
                for q, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75")]
            ]
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q43_collect_list",
    oracle="""
    SELECT r_name, list_sort(list(n_name)) AS nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    category="aggregate",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    """List aggregation: ``sort_array(collect_list())`` == DuckDB
    ``list_sort(list())`` (sorted for partition-order independence)."""
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("r_name")
        .agg(F.sort_array(F.collect_list("n_name")).alias("nations"))
        .orderBy("r_name")
    )


@query(
    "q44_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    category="aggregate",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (long→wide) with an explicit value list.

    Passing the pivot values up front skips the extra distinct-values job
    Spark otherwise runs — at scale, one full pass saved.
    """
    piv = (
        load_table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    ).orderBy("o_orderpriority")


@query(
    "q45_null_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag,
           CASE WHEN NULLIF(l_linestatus, 'O') IS NULL THEN -1.0
                ELSE l_quantity END AS qty_or_flagged
    FROM lineitem WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    category="scalar",
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    """Null-handling scalars: NULLIF / COALESCE / IS NULL propagation."""
    li = load_table(spark, sf, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")
        ).alias("flag"),
        F.when(
            F.nullif(F.col("l_linestatus"), F.lit("O")).isNull(), F.lit(-1.0)
        )
        .otherwise(F.col("l_quantity"))
        .alias("qty_or_flagged"),
    ).orderBy("l_orderkey", "l_linenumber")
