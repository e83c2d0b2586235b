"""Warehouse-operations batch shapes (split from extras.py, round 11 —
zero plan/oracle changes): salted skew joins, MERGE-style upserts,
LIMIT/OFFSET pagination, UNION BY NAME schema alignment, and the TPC-H Q5
6-way local-supplier-volume join. Same Tier-A conventions as
``stats.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.queries import query

@query(
    "q72_salted_skew_join",
    oracle="""
    WITH dim AS (SELECT event_type, avg(value) AS type_avg
                 FROM events GROUP BY event_type)
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           ROUND(min(d.type_avg), 4) AS type_avg
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    category="join",
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-mitigating SALTED join (``plans.skew.salted_join``), result-
    identical to the plain equi-join the oracle runs. ``event_type`` has
    very few distinct values — the worst-case skewed join key: a plain
    shuffle join sends each type's entire fan-in to ONE reducer. Salting
    splits every hot key into ``n_salts`` sub-keys: the fact side gets a
    deterministic row-hash salt, the dim side explodes ×n_salts, and the
    join key becomes (key, salt) — n_salts-way parallelism per hot key
    for a blowup of only the 3-row dim. The manual form of AQE skew-join,
    needed because sketch-sized dims sit below AQE's detection threshold
    yet still serialize the reduce side.
    """
    from final_project_big_data_spark.plans.skew import salted_join

    e = load_table(spark, sf, "events")
    dim = e.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    return (
        salted_join(e, dim, "event_type", n_salts=8)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("type_avg"), 4).alias("type_avg"),
        )
        .orderBy("event_type")
    )


@query(
    "q73_merge_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 1000
    ),
    changes AS (
      SELECT o_orderkey, o_totalprice * 1.1 AS new_price,
             CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders WHERE o_orderkey < 500
      UNION ALL
      SELECT o_orderkey + 1000000, 42.0, 'I'
      FROM orders WHERE o_orderkey < 100
    )
    SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
           ROUND(CASE WHEN c.op IS NULL THEN b.o_totalprice
                      ELSE c.new_price END, 4) AS o_totalprice,
           COALESCE(c.op, 'K') AS op
    FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
    WHERE c.op IS NULL OR c.op <> 'D'
    ORDER BY o_orderkey
    """,
    category="join",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE / upsert semantics (no Delta in this container, so the
    warehouse-standard rewrite): apply a change set (Update / Insert /
    Delete ops) to a base table with ONE full outer join on the key —
    matched-U rows take the new value, matched-D rows drop, unmatched-I
    rows append, untouched base rows keep ('K'). One shuffle on the merge
    key; at scale this is exactly the join a MERGE INTO compiles to, and
    the change set is usually small enough to broadcast.
    """
    o = load_table(spark, sf, "orders")
    base = o.filter(F.col("o_orderkey") < 1000).select(
        "o_orderkey", "o_totalprice"
    )
    upd = o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("new_price"),
        F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U").alias("op"),
    )
    ins = o.filter(F.col("o_orderkey") < 100).select(
        (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
        F.lit(42.0).alias("new_price"),
        F.lit("I").alias("op"),
    )
    changes = upd.unionAll(ins)
    merged = base.alias("b").join(
        changes.alias("c"), "o_orderkey", "full_outer"
    )
    return (
        merged.filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            "o_orderkey",
            F.round(
                F.when(F.col("c.op").isNull(), F.col("b.o_totalprice")).otherwise(
                    F.col("c.new_price")
                ),
                4,
            ).alias("o_totalprice"),
            F.coalesce(F.col("c.op"), F.lit("K")).alias("op"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q74_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    category="sort",
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic pagination: ORDER BY + OFFSET + LIMIT. Spark plans
    offset+limit as a driver-merged top-(offset+limit) per partition —
    like q26's TakeOrdered, no global sort; the skipped prefix must stay
    small (offset deep-paging is an anti-pattern at scale — keyset
    pagination, i.e. WHERE key > last_seen, is the 100 TB form).
    """
    return (
        load_table(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
    )


@query(
    "q75_union_by_name",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 4) AS o_totalprice
    FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey < 200
      UNION ALL BY NAME
      SELECT o_orderstatus, o_orderkey
      FROM orders WHERE o_orderkey >= 200 AND o_orderkey < 300
    )
    ORDER BY o_orderkey
    """,
    category="setop",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-evolution union: ``unionByName(allowMissingColumns=True)``
    aligns by column NAME (not position) and null-fills absent columns —
    the operator that makes appending an evolved-schema batch safe.
    Map-only (no shuffle); the ORDER BY is the usual determinism
    convention.
    """
    o = load_table(spark, sf, "orders")
    a = o.filter(F.col("o_orderkey") < 200).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b = (
        o.filter((F.col("o_orderkey") >= 200) & (F.col("o_orderkey") < 300))
        .select("o_orderstatus", "o_orderkey")
    )
    return (
        a.unionByName(b, allowMissingColumns=True)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 4).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q76_tpch_q5_shape",
    oracle="""
    SELECT n.n_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l.l_discount AS DECIMAL(18,4)))
                      AS DOUBLE), 4) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name ORDER BY revenue DESC, n_name
    """,
    category="join",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape — the 6-way local-supplier-volume join: two fact
    tables joined to a dim chain with a cross-fact equality
    (c_nationkey = s_nationkey). The plan the 100 TB posture is built
    for: customer/supplier/nation/region broadcast, lineitem⋈orders is
    the one big shuffle with the date filter pushed to the orders scan,
    revenue ACCUMULATES exactly in DECIMAL (order-independent across
    partitions) but is EMITTED as ROUND(CAST(x AS DOUBLE), 4): wide
    DECIMAL(38,x) outputs render differently in pandas-based
    canonicalizers on the Spark vs DuckDB side (driver round-3 finding
    on this very entry).
    """
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(price * disc).cast("double"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


