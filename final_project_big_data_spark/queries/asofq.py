"""As-of join driver entry, oracle-checked against DuckDB's native ASOF JOIN."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.operators.asof import asof_join
from final_project_big_data_spark.queries import query


@query(
    "x01_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.ts AS asof_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY purchase_id
    """,
    category="asof",
)
def x01(spark: SparkSession, sf: str) -> DataFrame:
    """Each purchase joined to the same user's most recent prior click.

    Spark side: single-shuffle union+window as-of (operators/asof.py);
    oracle side: DuckDB's built-in ASOF LEFT JOIN.
    """
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id")
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "asof_ts",
    ).orderBy("purchase_id")


@query(
    "x02_interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    ORDER BY purchase_id, click_id
    """,
    category="asof",
)
def x02(spark: SparkSession, sf: str) -> DataFrame:
    """Batch interval join: every click within the hour before a purchase,
    same user (C17's range-join form; the batch analogue of the
    stream-stream interval join).

    Plan shape: the user_id equality makes this a hash/SMJ equi-join with
    the time bounds as residual filters — never a banded nested loop. At
    scale the equi-key bounds the pair space; for key-free range joins,
    bucketize time into join keys first (same banding idea as LSH).
    """
    ev = load_table(spark, sf, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(c, "user_id")
        .filter(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .select("purchase_id", "click_id", "user_id")
        .orderBy("purchase_id", "click_id")
    )


@query(
    "x03_global_index",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1
                AS BIGINT) AS row_index
    FROM documents ORDER BY doc_id
    """,
    category="indexing",
)
def x03(spark: SparkSession, sf: str) -> DataFrame:
    """Dense 0-based global row index over a total order — zipWithIndex
    semantics without the single-reducer window (operators/indexing.py:
    range exchange + per-partition counts + broadcast prefix offsets).
    The oracle's empty-OVER row_number is exactly the plan this operator
    exists to avoid at scale.
    """
    from final_project_big_data_spark.operators.indexing import with_global_index

    d = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    return (
        with_global_index(d, [F.desc("n_chars"), F.asc("doc_id")], "row_index")
        .select("doc_id", "row_index")
        .orderBy("doc_id")
    )


@query(
    "x06_asof_join_forward",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.ts AS next_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    ORDER BY purchase_id
    """,
    category="asof",
)
def x06(spark: SparkSession, sf: str) -> DataFrame:
    """FORWARD as-of: each purchase joined to the same user's NEXT click
    at-or-after it (the "time-to-next-event" primitive — attribution,
    churn windows). Same single-shuffle union+window plan as x01 with the
    tie order and frame flipped (operators/asof.py direction='forward');
    oracle is DuckDB's ASOF with the comparison reversed.
    """
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, on="user_id", direction="forward")
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_ts").alias("next_click_ts"),
    ).orderBy("purchase_id")
