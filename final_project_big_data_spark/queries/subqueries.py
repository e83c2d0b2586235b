"""TPC-H-shape subquery / decorrelation family (q79–q85).

The reference's SQL surface has no subqueries at all (SURVEY §2.1 — its
queries are straight scans + casts, ``tasks/scripts/prepare_data.py:19-31``);
this family completes the generalized contract's subquery coverage beyond
q38/q39/q63: EXISTS with a correlated non-equi predicate (TPC-H Q4),
null-aware NOT IN (the classic three-valued-logic trap), HAVING-driven
IN (Q18), outer-join count distributions including empty groups (Q13),
min-per-group argmin joins (Q2), quantified ALL comparison, and a
NOT-EXISTS + scalar-average combination (Q22).

Every Spark plan here is the *decorrelated* form — semi/anti joins and
broadcast 1-row aggregates — because that is the shape that scales: a
correlated per-row re-execution is exactly what Catalyst's subquery
rewrite rules exist to eliminate. The DuckDB oracles keep the textbook
correlated/quantified SQL so both spellings are proven equivalent on
every value.

Tier-A conventions: total ORDER BY with unique tiebreak, ROUND(·,4) on
floating aggregates, CAST to Spark's output types on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.queries import query


@query(
    "q79_exists_correlated",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    category="subquery",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: orders (in a date window) having at least one
    line item shipped >60 days after the order date, counted by priority.

    The correlated EXISTS decorrelates to a LEFT SEMI join whose equi key
    (`l_orderkey = o_orderkey`) carries the shuffle and whose non-equi
    lateness predicate rides along in the join condition — one hash
    semi-join, no per-row subquery execution. The date filter is applied
    to orders BEFORE the join so the parquet scan prunes first.
    """
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q80_not_in_null_aware",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem
                            WHERE l_discount >= 0.095 AND l_quantity >= 48
                              AND l_returnflag = 'R')
    ORDER BY s_suppkey
    """,
    category="subquery",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    """NOT IN over a subquery — kept as SQL text on the Spark side so
    Catalyst plans its genuine null-aware anti join (one NULL in the
    subquery empties the result under three-valued logic; a naive
    left_anti would not).

    Scale note: null-aware NOT IN requires broadcasting the subquery side
    (Spark refuses a shuffled version). Here that side is an aggregated
    key set — tiny after dedup — which is the only shape NOT IN should
    ever take at 100 TB; for provably non-null keys, rewrite to left_anti
    (q11) and shuffle freely.
    """
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM {supplier}
        WHERE s_suppkey NOT IN (SELECT l_suppkey FROM {lineitem}
                                WHERE l_discount >= 0.095 AND l_quantity >= 48
                                  AND l_returnflag = 'R')
        ORDER BY s_suppkey
        """,
        supplier=load_table(spark, sf, "supplier"),
        lineitem=load_table(spark, sf, "lineitem"),
    )


@query(
    "q81_having_in",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 280
    )
    SELECT c.c_name, o.o_orderkey, ROUND(o.o_totalprice, 4) AS totalprice,
           ROUND(b.sum_qty, 4) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_orderkey
    """,
    category="subquery",
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (total quantity > 280) joined
    back to orders + customer.

    The IN-(GROUP BY … HAVING) subquery is planned as aggregate-then-join:
    the aggregate shrinks lineitem to one row per qualifying order before
    any join, so the expensive fact-fact join never happens — the join
    inputs are |big| rows (a few dozen) versus |orders|. Spark broadcasts
    the aggregated side automatically under AQE.
    """
    li = load_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 280)
    )
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            F.round("sum_qty", 4).alias("sum_qty"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q82_outer_count_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    category="subquery",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts where
    the filter lives in the OUTER join condition — customers whose every
    order is urgent still appear with count 0 (`count(o_orderkey)` skips
    the NULLs a left join manufactures). Two cascaded aggregations, each
    shrinking its input; the second groups on a handful of distinct
    counts, so the final shuffle is trivially small.
    """
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = load_table(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q83_argmin_join",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS c
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY l_partkey ORDER BY c, l_suppkey) AS rn
      FROM cost
    )
    SELECT p.p_partkey, p.p_name, s.s_name, ROUND(r.c, 4) AS min_cost
    FROM ranked r
    JOIN part p ON r.l_partkey = p.p_partkey
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.rn = 1 AND p.p_size < 8
    ORDER BY p.p_partkey
    """,
    category="subquery",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: for each (filtered) part, the supplier offering the
    minimum observed price — the argmin-per-group join the textbook writes
    as a correlated `= (SELECT min(...))` subquery.

    Decorrelated: aggregate to (part, supp) minima, then a row_number
    window PARTITIONED by part (thousands of small partitions — no global
    window), then equi joins to the dimension tables. The supplier join is
    broadcast-size; part carries the p_size filter down to its scan.
    """
    li = load_table(spark, sf, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("c")
    )
    w = W.partitionBy("l_partkey").orderBy("c", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    p = load_table(spark, sf, "part").filter(F.col("p_size") < 8)
    s = load_table(spark, sf, "supplier")
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("c", 4).alias("min_cost"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q84_quantified_all",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 4) AS totalprice
    FROM orders
    WHERE o_totalprice > ALL (
      SELECT o2.o_totalprice FROM orders o2
      JOIN customer c ON o2.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal < 0)
    ORDER BY o_orderkey
    """,
    category="subquery",
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    """Quantified comparison — orders larger than ALL orders of
    negative-balance BUILDING customers.

    `> ALL (subq)` rewrites to `> (SELECT max(subq))`: one 1-row
    broadcast aggregate against the fact scan (same map-only shape as
    q38's scalar subquery). The oracle keeps the quantified spelling to
    pin the equivalence. (Empty-subquery caveat: ALL over an empty set is
    TRUE, while a max() comparison yields NULL — the fixture subset is
    verified non-empty, and the rewrite is what every optimizer, Spark's
    included, performs.)
    """
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer").filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") < 0)
    )
    thresh = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .agg(F.max("o_totalprice").alias("mx"))
    )
    return (
        o.join(F.broadcast(thresh))
        .filter(F.col("o_totalprice") > F.col("mx"))
        .select(
            "o_orderkey", F.round("o_totalprice", 4).alias("totalprice")
        )
        .orderBy("o_orderkey")
    )


@query(
    "q85_not_exists_scalar_avg",
    oracle="""
    WITH ab AS (SELECT avg(c_acctbal) AS avg_bal FROM customer
                WHERE c_acctbal > 0)
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           ROUND(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c, ab
    WHERE c.c_acctbal > ab.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    category="subquery",
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    order, aggregated by segment.

    Two decorrelations in one plan: the scalar AVG becomes a 1-row
    broadcast cross join (map-side filter), and NOT EXISTS becomes a LEFT
    ANTI join on the customer key with the priority filter pushed INTO the
    anti side's scan — the anti join's build input is only urgent orders,
    not all orders.
    """
    c = load_table(spark, sf, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
