"""Custom-compute surfaces: UDF / pandas UDF / grouped UDAF / UDTF fan-out
(SURVEY.md §2.4 C05–C08).

The reference has zero UDFs (its only custom compute is MLlib
``model.transform``, ``/root/reference/tasks/scripts/predict.py:34``); these
queries declare the engine's escape hatches and pin their semantics against
SQL oracles. Hierarchy (fast→slow): built-in functions ≫ Arrow-batched
pandas UDF / mapInPandas ≫ row-at-a-time Python UDF. Only u01 uses the slow
path — deliberately, to prove the surface; everything the engine ships for
scale (dedup, similarity, multimodal) rides the Arrow paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.plans.ordering import sorted_project
from final_project_big_data_spark.queries import query

# ------------------------------------------------------------- C05 Python UDF


@query(
    "u01_python_udf",
    oracle="""
    SELECT o_orderkey, o_totalprice * 0.93 + 10.0 AS adj_price
    FROM orders WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
    category="udf",
)
def u01(spark: SparkSession, sf: str) -> DataFrame:
    """Row-at-a-time Python UDF == native arithmetic (C05).

    The float expression is evaluated with the same operand order on both
    sides, so results are bit-identical before the oracle's 4-decimal
    canonicalization. Filter applied BEFORE the UDF so the parquet scan
    still gets the pushed predicate (UDFs block pushdown through them).
    """

    @F.udf(returnType=T.DoubleType())
    def adj(price: float) -> float:
        return price * 0.93 + 10.0

    return sorted_project(
        load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 2000),
        ["o_orderkey"],
        "o_orderkey",
        adj("o_totalprice").alias("adj_price"),
    )


# ------------------------------------------------------------- C06 pandas UDF


@query(
    "u02_pandas_udf",
    oracle="""
    SELECT c_custkey, UPPER(c_name) || '#' || REVERSE(c_mktsegment) AS tag
    FROM customer ORDER BY c_custkey
    """,
    category="udf",
)
def u02(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF == native string functions (C06).

    String transform (no float hazard): vectorized pandas ``str`` ops over
    Arrow record batches — the fast Python path (~10-100× the row-at-a-time
    UDF of u01).
    """

    @F.pandas_udf(T.StringType())
    def tag(name: pd.Series, seg: pd.Series) -> pd.Series:
        return name.str.upper() + "#" + seg.map(lambda s: s[::-1])

    return sorted_project(
        load_table(spark, sf, "customer"),
        ["c_custkey"],
        "c_custkey",
        tag("c_name", "c_mktsegment").alias("tag"),
    )


# ----------------------------------------------------- C07 grouped UDAF-style


@query(
    "u03_grouped_udaf",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    category="udf",
)
def u03(spark: SparkSession, sf: str) -> DataFrame:
    """``applyInPandas`` grouped aggregation == ``groupBy().agg()`` (C07).

    One whole-group pandas frame per market segment; min/max/count are
    order-independent so the result is exact regardless of partitioning.
    Scale note: applyInPandas shuffles FULL rows of each group to one task —
    fine for bounded groups (5 segments here), wrong for heavy-hitter keys;
    the built-in agg (the oracle's plan) does map-side partial aggregation
    and is what the engine uses when semantics fit.
    """

    def seg_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "n": [len(pdf)],
                "min_bal": [pdf["c_acctbal"].min()],
                "max_bal": [pdf["c_acctbal"].max()],
            }
        )

    return (
        load_table(spark, sf, "customer")
        .select("c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(
            seg_stats,
            schema="c_mktsegment string, n bigint, min_bal double, max_bal double",
        )
        .orderBy("c_mktsegment")
    )


# ------------------------------------------------------- C08 UDTF-style fanout


@query(
    "u04_udtf_fanout",
    oracle="""
    SELECT doc_id, u.i AS word_idx, u.w AS word FROM (
      SELECT doc_id,
             unnest(list_transform(string_split(text, ' '),
                                   (x, i) -> {'i': CAST(i AS INT), 'w': x})) AS u
      FROM documents WHERE doc_id < 50
    )
    ORDER BY doc_id, word_idx
    """,
    category="udf",
)
def u04(spark: SparkSession, sf: str) -> DataFrame:
    """``mapInPandas`` one-row→many-rows fan-out (UDTF shape, C08).

    Splits each document into (word_idx, word) rows — rows out > rows in,
    the shape ``explode`` can't cover when per-row Python generation is
    genuinely needed. Arrow-batched; split semantics (single space, empties
    kept) match DuckDB ``string_split``.
    """

    def words(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                for i, w in enumerate(text.split(" "), start=1):
                    ids.append(did)
                    idxs.append(i)
                    ws.append(w)
            yield pd.DataFrame({"doc_id": ids, "word_idx": idxs, "word": ws})

    return (
        load_table(spark, sf, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .mapInPandas(words, schema="doc_id bigint, word_idx int, word string")
        .orderBy("doc_id", "word_idx")
    )


# ------------------------------------------- SQL-registered UDF + real UDTF


@query(
    "u05_sql_registered_udf",
    oracle="""
    SELECT o_orderkey,
           CAST(length(o_orderpriority) + o_orderkey % 5 AS BIGINT) AS score
    FROM orders WHERE o_orderkey < 1500 ORDER BY o_orderkey
    """,
    category="udf",
)
def u05(spark: SparkSession, sf: str) -> DataFrame:
    """UDF registered into the SQL catalog (``spark.udf.register``) and
    invoked from SQL TEXT — the other entry path next to u01's DataFrame
    column API. Same perf caveat as any row UDF; registration itself is
    session-scoped metadata, safe to repeat (re-registering replaces).
    The query plans through the SQL parser over a registered temp view, so
    the filter still reaches the parquet scan below the UDF projection.
    """

    def prio_score(prio: str, key: int) -> int:
        return len(prio) + key % 5

    spark.udf.register("prio_score", prio_score, T.LongType())
    load_table(spark, sf, "orders").createOrReplaceTempView("u05_orders")
    return spark.sql(
        """
        SELECT o_orderkey, prio_score(o_orderpriority, o_orderkey) AS score
        FROM u05_orders WHERE o_orderkey < 1500 ORDER BY o_orderkey
        """
    )


@query(
    "u06_python_udtf",
    oracle="""
    SELECT o_orderkey, part_no, token
    FROM (SELECT o_orderkey,
                 CAST(unnest(generate_series(1, len(string_split(o_orderpriority, '-'))))
                      AS INT) AS part_no,
                 unnest(string_split(o_orderpriority, '-')) AS token
          FROM orders WHERE o_orderkey < 300)
    ORDER BY o_orderkey, part_no
    """,
    category="udf",
)
def u06(spark: SparkSession, sf: str) -> DataFrame:
    """A REAL Python UDTF (class-based ``@udtf`` API, lateral-joined per
    input row) — u04 emulates table-function fan-out with mapInPandas;
    this is the first-class surface: ``eval`` yields any number of typed
    rows per input. Runs row-at-a-time Python (the slow path, like u01 —
    declared, not used in scale paths, where explode/mapInPandas win).
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="part_no int, token string")
    class SplitPriority:
        def eval(self, prio: str):
            for i, tok in enumerate(prio.split("-")):
                yield i + 1, tok

    spark.udtf.register("split_priority", SplitPriority)
    load_table(spark, sf, "orders").createOrReplaceTempView("u06_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, s.part_no, s.token
        FROM u06_orders o, LATERAL split_priority(o.o_orderpriority) s
        WHERE o.o_orderkey < 300
        ORDER BY o.o_orderkey, s.part_no
        """
    )


# ------------------------------------------------- cogrouped applyInPandas


@query(
    "u07_cogrouped_pandas",
    oracle="""
    SELECT c.c_custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(coalesce(sum(o.o_totalprice), 0), 4) AS total_spend,
           ROUND(max(c.c_acctbal), 4) AS acctbal
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 200
    GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
    category="udf",
)
def u07(spark: SparkSession, sf: str) -> DataFrame:
    """``cogroup(...).applyInPandas`` — the two-sided grouped-UDF surface:
    each key's customer rows AND order rows arrive as a pandas frame pair,
    here merged into a per-customer spend profile.

    Both sides shuffle once on the key (a cogroup is exactly a co-
    partitioned join at the physical level); the Python stage sees one
    bounded key group at a time. Same caveat as u03: heavy-hitter keys
    belong in the built-in join/agg path (the oracle's plan) — cogroup is
    for genuinely imperative per-key merges (model scoring, rule engines)
    that SQL can't express.

    The key-range predicate is applied to BOTH inputs: Catalyst cannot
    push a filter through a Python cogroup (the UDF is opaque), so
    without the manual mirror every orders key would shuffle, spawn a
    pandas frame pair, and cross into Python just to be discarded by the
    empty-customer branch — ~17× slower here, unboundedly worse at scale.
    Semantics are identical because keys absent from the kept side emit
    nothing.
    """

    def profile(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if cust.empty:
            return pd.DataFrame(
                columns=["c_custkey", "n_orders", "total_spend", "acctbal"]
            )
        return pd.DataFrame(
            {
                "c_custkey": [int(cust["c_custkey"].iloc[0])],
                "n_orders": [len(orders)],
                "total_spend": [round(float(orders["o_totalprice"].sum()), 4)],
                "acctbal": [round(float(cust["c_acctbal"].max()), 4)],
            }
        )

    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") < 200)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_custkey") < 200)
        .select("o_custkey", "o_totalprice")
    )
    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            profile,
            schema="c_custkey bigint, n_orders bigint, "
            "total_spend double, acctbal double",
        )
        .orderBy("c_custkey")
    )


# ------------------------------------------------------------- mapInArrow


@query(
    "u08_arrow_batch_map",
    oracle="""
    -- the charge product has exactly <= 6 decimal digits (2+2+2), so
    -- casting the double to DECIMAL(18,6) recovers the exact product on
    -- both engines BEFORE rounding; rounding the raw double instead is
    -- engine-dependent at .XXXX5 boundaries (Spark rounds the shortest
    -- repr half-up, DuckDB rounds the binary value)
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(18,6)), 4) AS DECIMAL(18,4))
                AS DOUBLE) AS charge
    FROM lineitem WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    category="udf",
)
def u08(spark: SparkSession, sf: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy batch surface below mapInPandas: the
    UDF receives raw ``pyarrow.RecordBatch``es (no pandas conversion, no
    index materialization) and answers with Arrow compute kernels.

    This is the right slot for columnar libraries that speak Arrow
    natively (vectorized tokenizers, image codecs): per-batch overhead is
    one FFI hop. The arithmetic here is deliberately the TPC-H charge
    expression so the oracle is plain SQL; the *surface* (Arrow in/out,
    batch-at-a-time) is what's under test. Filter sits BEFORE the UDF so
    parquet pushdown still applies.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def charge(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            price = b.column("l_extendedprice")
            disc = b.column("l_discount")
            tax = b.column("l_tax")
            # no pc.round here: Arrow rounds half-to-even, DuckDB/Spark
            # ROUND rounds half-away — final rounding stays in F.round
            ch = pc.multiply(
                pc.multiply(price, pc.subtract(pa.scalar(1.0), disc)),
                pc.add(pa.scalar(1.0), tax),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), ch],
                names=["l_orderkey", "l_linenumber", "charge"],
            )

    return (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
            "l_tax",
        )
        .mapInArrow(
            charge,
            schema="l_orderkey bigint, l_linenumber int, charge double",
        )
        .withColumn(
            # rounding happens in exact DECIMAL (engine-independent), but
            # the EMITTED column is double: Decimal objects survive
            # toPandas and hash-drift against DuckDB's float64 rendering
            # in the driver's canonicalizer (driver-mimic finding)
            "charge",
            F.round(F.col("charge").cast("decimal(18,6)"), 4)
            .cast("decimal(18,4)")
            .cast("double"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
