"""Scalar/aggregate/window-function completeness batch (split from
extras.py, round 11 — zero plan/oracle changes): median/deterministic-mode,
sequence fan-out, cryptographic hash functions, windowed distinct counts,
grouping-indicator rollups, bitwise operators, width-bucket histograms,
lateral top-k, string/decimal aggregation, epoch formatting, null-safe
joins, IGNORE NULLS windows and VARIANT handling. Same Tier-A conventions
as ``stats.py``: total ORDER BY with unique tiebreak, ROUND(\u00b7,4) on
floating aggregates, matching column names on both sides of the oracle.

The reference exercises none of these (SURVEY \u00a72.1 \u2014 its scalar-function
surface is to_json/from_json/struct/cast/alias only,
``tasks/scripts/predict.py:30-44``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.queries import query

@query(
    "q56_median_mode",
    oracle="""
    WITH med AS (
      SELECT l_returnflag,
             ROUND(median(l_quantity), 4) AS med_qty,
             ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
      FROM lineitem GROUP BY l_returnflag
    ),
    cnt AS (
      SELECT l_returnflag, l_linestatus, count(*) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    md AS (
      SELECT l_returnflag, l_linestatus AS mode_status
      FROM (SELECT *, row_number() OVER (
              PARTITION BY l_returnflag ORDER BY c DESC, l_linestatus) AS rn
            FROM cnt)
      WHERE rn = 1
    )
    SELECT m.l_returnflag, med_qty, med_price, mode_status
    FROM med m JOIN md USING (l_returnflag)
    ORDER BY l_returnflag
    """,
    category="aggregate",
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    """Exact median (interpolated 50th percentile) plus a *deterministic*
    mode per group.

    Spark's ``mode()`` and DuckDB's ``mode()`` break frequency ties
    arbitrarily, so the mode here is declared as count-desc /
    value-asc — a groupBy count plus a row_number pick, identical
    semantics in both engines. Medians go through the distributed
    counting formulation (``operators/quantiles.py``), NOT Spark's
    built-in ``median``/``percentile``: the built-in's object aggregate
    buffers a counts-map per group keyed by VALUE, and at the 1000×
    probe (600M rows, 3 groups) that buffer GC-thrashed for 20+ minutes
    — the round-5 claim that group count bounds the reduce side was
    wrong (it bounds tasks, not buffers). The counting form's only
    full-data pass is a codegen hash agg; everything after is sized by
    distinct values per group.
    """
    li = load_table(spark, sf, "lineitem")
    from final_project_big_data_spark.operators.quantiles import (
        exact_quantile_cont,
    )

    med_q = exact_quantile_cont(
        li, ["l_returnflag"], "l_quantity", {"med_qty_raw": 0.5}
    )
    med_p = exact_quantile_cont(
        li, ["l_returnflag"], "l_extendedprice", {"med_price_raw": 0.5}
    )
    med = med_q.join(med_p, "l_returnflag").select(
        "l_returnflag",
        F.round("med_qty_raw", 4).alias("med_qty"),
        F.round("med_price_raw", 4).alias("med_price"),
    )
    cnt = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("c"))
    w = W.partitionBy("l_returnflag").orderBy(F.desc("c"), F.asc("l_linestatus"))
    mode = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_linestatus").alias("mode_status"))
    )
    return med.join(mode, "l_returnflag").orderBy("l_returnflag")


@query(
    "q57_sequence_fanout",
    oracle="""
    SELECT o_orderkey, val, val * o_orderkey AS scaled
    FROM (SELECT o_orderkey,
                 unnest(range(1, o_orderkey % 3 + 2)) AS val
          FROM orders WHERE o_orderkey < 300)
    ORDER BY o_orderkey, val
    """,
    category="array",
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    """Generator fan-out: ``sequence`` + ``explode`` producing 1–3 rows per
    order (DuckDB ``range`` + ``UNNEST``). The explode is row-local (no
    shuffle); output cardinality is bounded by 3× input, so the only
    scale consideration is downstream partition sizing, which AQE handles.
    """
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 300)
    seq = F.sequence(
        F.lit(1).cast("long"), (F.col("o_orderkey") % 3 + 1).cast("long")
    )
    return (
        o.select("o_orderkey", F.explode(seq).alias("val"))
        .withColumn("scaled", F.col("val") * F.col("o_orderkey"))
        .orderBy("o_orderkey", "val")
    )


@query(
    "q58_hash_fns",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS md5_hex,
           sha256(p_name) AS sha256_hex,
           CAST(length(md5(p_name)) AS INT) AS md5_len
    FROM part WHERE p_partkey < 400 ORDER BY p_partkey
    """,
    category="scalar",
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    """Cryptographic digests as deterministic row fingerprints (md5 +
    sha256 lowercase hex — identical canonical output in both engines).
    These are the content-hash primitives the exact-dedup operators
    (``dedup.py``) build on; fully codegen'd JVM-side, no UDF.
    """
    p = load_table(spark, sf, "part").filter(F.col("p_partkey") < 400)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("md5_hex"),
        F.sha2("p_name", 256).alias("sha256_hex"),
        F.length(F.md5("p_name")).alias("md5_len"),
    ).orderBy("p_partkey")


@query(
    "q59_windowed_count_distinct",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, d.distinct_supps
    FROM lineitem
    JOIN (SELECT l_returnflag,
                 CAST(count(DISTINCT l_suppkey) AS INT) AS distinct_supps
          FROM lineitem GROUP BY 1) d USING (l_returnflag)
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    category="window",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct count over an unbounded window — Spark disallows
    ``COUNT(DISTINCT)`` in window frames, so the declared surface is
    ``size(collect_set(x) OVER w)``; the oracle uses the equivalent
    aggregate-then-join rewrite.

    Scale note (hardened round 5 after the 100× sweep hung here; the
    remaining quadratic fixed round 6 after the 1000× sweep ground on
    it): the window runs over the DEDUPLICATED (flag, suppkey) pairs,
    never the raw fact — ``l_returnflag`` has 3 values, so a window
    over lineitem funnels the whole table through 3 single-threaded
    window partitions. Round 5 stopped there with
    ``size(collect_set(x) OVER w)``, which bounded the partition WIDTH
    but kept a second blowup: Spark's unbounded-frame window evaluates
    the aggregate's result PER ROW, and collect_set's evaluation
    materializes the whole set as a fresh array each time —
    |supps|² element-copies per flag (10¹² at the 1000× probe's 1M
    shifted suppliers; three tasks burned 20 CPU-minutes before being
    killed). Over deduplicated pairs, ``count(*) OVER w`` is the SAME
    number with an O(1)-per-row long evaluation — still a genuine
    window-function surface, no per-row array. The per-flag counts then
    broadcast-join back to the filtered fact rows, with the row filter
    pushed to the scan. For high-cardinality keys the HLL sketch (a01)
    remains the scale path.
    """
    li = load_table(spark, sf, "lineitem")
    w = W.partitionBy("l_returnflag")
    counts = (
        li.select("l_returnflag", "l_suppkey")
        # count(*) over deduplicated pairs must not count a NULL key —
        # size(collect_set(x)) / COUNT(DISTINCT x) semantics exclude NULLs
        # (TPC-H l_suppkey is non-null, but the operator shouldn't rely on it)
        .filter(F.col("l_suppkey").isNotNull())
        .distinct()
        .select(
            "l_returnflag",
            F.count(F.lit(1)).over(w).cast("int").alias("distinct_supps"),
        )
        .distinct()
    )
    return (
        li.filter(F.col("l_orderkey") < 500)
        .join(F.broadcast(counts), "l_returnflag")
        .select(
            "l_orderkey", "l_linenumber", "l_returnflag", "distinct_supps"
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q60_grouping_ids",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
             o_orderpriority NULLS FIRST
    """,
    category="aggregate",
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP with ``GROUPING()`` indicator columns — the standard way to
    distinguish subtotal NULLs from genuine NULL group values (q19 covers
    the bare rollup). Same single-shuffle expanded-aggregate plan as q19.
    """
    o = load_table(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .orderBy(
            "g_status",
            "g_prio",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "q61_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS b_and,
           o_orderkey | 16 AS b_or,
           xor(o_orderkey, 21) AS b_xor,
           o_orderkey << 2 AS b_shl,
           o_orderkey >> 3 AS b_shr
    FROM orders WHERE o_orderkey < 600 ORDER BY o_orderkey
    """,
    category="scalar",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise operator surface (&, |, xor, shifts) — the primitives the
    SimHash/LSH band operators use for bucket manipulation
    (``similarity.py``, ``dedup.py``). Pure codegen'd projections.
    """
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 600)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("b_and"),
        k.bitwiseOR(F.lit(16)).alias("b_or"),
        k.bitwiseXOR(F.lit(21)).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 3).alias("b_shr"),
    ).orderBy("o_orderkey")


@query(
    "q62_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice >= 600000 THEN 21
                     WHEN o_totalprice < 0 THEN 0
                     ELSE CAST(FLOOR(o_totalprice / 30000) AS INT) + 1
                END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(min(o_totalprice), 4) AS lo,
           ROUND(max(o_totalprice), 4) AS hi
    FROM orders GROUP BY 1 ORDER BY bucket
    """,
    category="aggregate",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram via ``width_bucket`` (20 buckets over
    [0, 600000); DuckDB lacks width_bucket, so the oracle spells out the
    same floor arithmetic). One map-side-combinable aggregation — the
    classic distributed-histogram shape: constant-size partials per
    partition regardless of data volume.
    """
    o = load_table(spark, sf, "orders")
    bucket = F.width_bucket(
        F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(20)
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("lo"),
            F.round(F.max("o_totalprice"), 4).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "q63_lateral_topk",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 4) AS price
    FROM customer c
    JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON true
    WHERE c.c_custkey < 100
    ORDER BY c.c_custkey, price DESC, o.o_orderkey
    """,
    category="join",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery — per-customer top-2 orders expressed as
    a dependent join, the SQL-standard alternative to the window-rank
    rewrite (q22). Catalyst decorrelates it into a ranked join
    (DomainJoin → window + filter), so the physical plan is the same
    single-shuffle shape as the explicit window form — no per-row
    re-execution at any scale.
    """
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 4) AS price
        FROM {customer} c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM {orders}
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey < 100
        ORDER BY c.c_custkey, price DESC, o.o_orderkey
        """,
        customer=load_table(spark, sf, "customer"),
        orders=load_table(spark, sf, "orders"),
    )


@query(
    "q64_string_agg",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_name) AS names,
           CAST(count(*) AS BIGINT) AS n
    FROM customer WHERE c_custkey < 60
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    category="aggregate",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (STRING_AGG / LISTAGG semantics).

    Declared deterministically as sort-then-join: Spark's collect_list
    order is partition-dependent, so the engine sorts the collected array
    before joining — same result as DuckDB's ``ORDER BY`` inside
    string_agg. Group payload is bounded by group size; for unbounded
    groups the scale path is capping with ``slice`` after sort.
    """
    c = load_table(spark, sf, "customer").filter(F.col("c_custkey") < 60)
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "names"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q65_decimal_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 4)
                AS VARCHAR) AS sum_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l_discount AS DECIMAL(18,4))), 4)
                AS VARCHAR) AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    category="aggregate",
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    """Exact DECIMAL aggregation: all accumulation happens in DECIMAL(18,4)
    unscaled-long partial sums inside codegen (same map-side-combine shape
    as any hash aggregate, no floating accumulation-order drift), rounded
    IN THE DECIMAL DOMAIN and rendered server-side as a string.

    Output-boundary history (SURVEY §7.4's rendering rule, third class):
    (1) raw DECIMAL columns hash-drift in the harness's client-side
    rendering (CORRECTNESS_r03 q76/q77), so round 3 projected
    ROUND(CAST(· AS DOUBLE), 4); (2) the guarded 100× sweep then caught
    THAT projection drifting one ulp — at sum ≈ 1e12 a double's ulp
    (~1.2e-4) exceeds half the 4th-decimal step, so the engines' differing
    round implementations (Spark BigDecimal-exact vs DuckDB x*1e4 beyond
    2^53) legally disagree. The fix rounds while still exact —
    ``round(decimal, 4)`` is HALF_UP away-from-zero on both engines — and
    casts the identical decimal to VARCHAR server-side, which both
    engines render identically at any magnitude (verified: scale-4
    trailing zeros match). Exactness itself is additionally pinned
    engine-to-engine as unrounded ``Decimal`` equality in
    tests/test_decimal_parity.py.
    """
    li = load_table(spark, sf, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(price), 4).cast("string").alias("sum_price"),
            F.round(F.sum(price * disc), 4).cast("string").alias("sum_disc_price"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q66_ts_epoch_format",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           strftime(ts, '%Y-%m-%d %H:%M') AS fmt_minute,
           CAST(date_part('dow', ts) AS INT) AS dow,
           CAST(date_part('doy', ts) AS INT) AS doy
    FROM events WHERE event_id < 2000 ORDER BY event_id
    """,
    category="datetime",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    """Epoch conversion + timestamp formatting + day-of-week/year (q32's
    family completed). Semantics pinned UTC both sides; Spark
    ``unix_timestamp`` truncates sub-second (DuckDB oracle floors to
    match), and Spark's ``dayofweek`` is 1=Sunday vs DuckDB ``dow``
    0=Sunday — mapped with -1. Map-only expressions.
    """
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("fmt_minute"),
        (F.dayofweek("ts") - 1).alias("dow"),
        F.dayofyear("ts").alias("doy"),
    ).orderBy("event_id")


@query(
    "q67_null_safe_join",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM (SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS k
          FROM supplier WHERE s_suppkey < 40) s
    JOIN (SELECT c_custkey, nullif(c_nationkey % 5, 0) AS k
          FROM customer WHERE c_custkey < 40) c
      ON s.k IS NOT DISTINCT FROM c.k
    ORDER BY s_suppkey, c_custkey
    """,
    category="join",
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of disappearing, unlike q06's plain equality.
    Spark plans ``eqNullSafe`` as a HASH join key (null hashes to a
    bucket like any value) — same shuffle/broadcast shapes as a normal
    equi join, NOT a nested loop; NULL-heavy keys behave like any other
    hot key and fall under AQE skew handling.
    """
    s = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_suppkey") < 40)
        .select(
            "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("k")
        )
    )
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") < 40)
        .select(
            "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("k")
        )
    )
    return (
        s.join(c, s.k.eqNullSafe(c.k))
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    )


@query(
    "q68_window_ignore_nulls",
    oracle="""
    SELECT o_orderkey,
           last_value(nullif(o_orderstatus, 'P') IGNORE NULLS) OVER w
             AS last_known_status,
           first_value(nullif(o_orderstatus, 'P') IGNORE NULLS) OVER w
             AS first_known_status
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
    category="window",
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    """IGNORE NULLS window navigation — the forward-fill primitive
    (q55's gap-fill uses the same shape over a time spine): last non-NULL
    status seen so far per customer. Running frame, single hash shuffle
    on the partition key.
    """
    from pyspark.sql import Window as W

    o = load_table(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    status = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        F.last(status, ignorenulls=True).over(w).alias("last_known_status"),
        F.first(status, ignorenulls=True).over(w).alias("first_known_status"),
    ).orderBy("o_orderkey")


@query(
    "q69_variant_type",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k,
           CAST(CAST(props->>'$.k' AS INT) // 10 AS INT) AS k_decile,
           props->>'$.missing' IS NULL AS missing_is_null
    FROM events WHERE event_id < 3000 ORDER BY event_id
    """,
    category="json",
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 VARIANT type: ``parse_json`` into a binary variant column,
    typed ``variant_get`` path extraction (q37's string-JSON surface on
    the modern encoding). Variant parses once per row and each get is an
    O(1) binary probe — at scale this replaces re-parsing the JSON string
    per extracted field; absent paths yield NULL, not errors.
    """
    ev = load_table(spark, sf, "events").filter(F.col("event_id") < 3000)
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.floor(k / 10).cast("int").alias("k_decile"),
        F.variant_get(v, "$.missing", "string").isNull().alias("missing_is_null"),
    ).orderBy("event_id")


