"""Second completeness batch beyond SURVEY §2.4's letter queries:
median/deterministic-mode, sequence fan-out, cryptographic hash functions,
windowed distinct counts, grouping-indicator rollups, bitwise operators and
width-bucket histograms. Same Tier-A conventions as ``stats.py``: total
ORDER BY with unique tiebreak, ROUND(·,4) on floating aggregates, matching
column names on both sides of the oracle.

The reference exercises none of these (SURVEY §2.1 — its scalar-function
surface is to_json/from_json/struct/cast/alias only,
``tasks/scripts/predict.py:30-44``); they are part of the generalized
analytics contract.
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


@query(
    "q70_sessionization",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
      FROM x
    )
    SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
    category="window",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization — the classic gap-based session assignment
    (new session when >30 min since the user's previous event): lag +
    running sum of boundary flags, then a per-session rollup. Every
    window is partitioned by ``user_id`` — the state never leaves one
    user's partition, so the plan holds at any user count. The streaming
    twin is ``session_window`` (w02); this is its batch oracle shape.
    Timestamp arithmetic stays in the interval domain (no epoch
    truncation) so both engines compare gaps at full precision.
    """
    e = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag("ts").over(w)
    ns = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    return (
        e.withColumn("_ns", ns)
        .withColumn("session_id", F.sum("_ns").over(wrun).cast("int"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "q71_linear_interpolate",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             max(value) AS v
      FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    ),
    bounds AS (SELECT event_type, min(day) AS lo, max(day) AS hi
               FROM d GROUP BY event_type),
    spine AS (
      SELECT b.event_type, CAST(s.day AS DATE) AS day
      FROM bounds b,
           UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS s(day)
    ),
    j AS (SELECT s.event_type, s.day, d.v
          FROM spine s LEFT JOIN d USING (event_type, day)),
    f AS (
      SELECT event_type, day, v,
             last_value(v IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER wb AS pd,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER wf AS nd
      FROM j
      WINDOW wb AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (day - pd) / (nd - pd)
           END, 4) AS value_interp,
           (v IS NULL) AS was_gap
    FROM f ORDER BY event_type, day
    """,
    category="window",
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series linear interpolation over a daily spine (q55's gap-fill
    upgraded from forward-fill to true interpolation): missing days get
    ``prev + (next-prev) * elapsed/gap``. Spine generation is per-key
    ``sequence()`` fan-out; prev/next anchors are IGNORE NULLS running
    windows partitioned by ``event_type`` — no global window, no state
    outside one key's partition.
    """
    e = load_table(spark, sf, "events")
    # daily PEAK, not mean: max is summation-order-independent, so both
    # engines interpolate from bit-identical anchors (a double avg differs
    # in accumulation order and the engines' ROUNDs split at half-boundaries)
    d = (
        e.groupBy("event_type", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.max("value").alias("v"))
    )
    spine = (
        d.groupBy("event_type")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
        )
    )
    j = spine.join(d, ["event_type", "day"], "left")
    wb = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_day = F.when(F.col("v").isNotNull(), F.col("day"))
    f = j.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(known_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(known_day, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * F.datediff("day", "pd")
            / F.datediff("nd", "pd")
        )
    )
    return f.select(
        "event_type",
        "day",
        F.round(interp, 4).alias("value_interp"),
        F.col("v").isNull().alias("was_gap"),
    ).orderBy("event_type", "day")


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


@query(
    "q77_time_weighted_avg",
    oracle="""
    WITH g AS (
      SELECT event_type, ts, value,
             lead(ts) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS next_ts
      FROM events
    ),
    w AS (
      SELECT event_type,
             CAST(value AS DECIMAL(18,6))
               * CAST(date_diff('second', ts, next_ts) AS BIGINT) AS wv,
             CAST(date_diff('second', ts, next_ts) AS BIGINT) AS dur
      FROM g WHERE next_ts IS NOT NULL
    )
    SELECT event_type,
           ROUND(CAST(SUM(wv) AS DOUBLE), 4) AS weighted_sum,
           CAST(SUM(dur) AS BIGINT) AS total_secs,
           ROUND(CAST(SUM(wv) AS DOUBLE) / SUM(dur), 4) AS twap
    FROM w GROUP BY event_type ORDER BY event_type
    """,
    category="window",
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average (TWAP) — each observation weighted by how
    long it was current (lead-ts gap), the standard irregular-time-series
    mean for sensor/market data. Weights multiply in exact DECIMAL so the
    per-type sums are accumulation-order independent (a double product
    sum would drift between engines); driver-facing columns are emitted
    as ROUND(CAST(x AS DOUBLE), 4) on both sides because wide
    DECIMAL(38,x) outputs render differently in pandas-based
    canonicalizers (driver round-3 finding). Windows are partitioned by
    event_type: one hash shuffle, state never leaves the key's partition.
    """
    e = load_table(spark, sf, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        "ts",
        "value",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    dur = (F.unix_timestamp("next_ts") - F.unix_timestamp("ts")).cast("long")
    wv = F.col("value").cast("decimal(18,6)") * dur
    return (
        g.select("event_type", wv.alias("wv"), dur.alias("dur"))
        .groupBy("event_type")
        .agg(
            F.round(F.sum("wv").cast("double"), 4).alias("weighted_sum"),
            F.sum("dur").alias("total_secs"),
            F.round(
                F.sum("wv").cast("double") / F.sum("dur"), 4
            ).alias("twap"),
        )
        .orderBy("event_type")
    )


@query(
    "q100_event_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT stage, CAST(users AS BIGINT) AS users FROM (
      SELECT 1 AS stage, count(*) AS users FROM s1
      UNION ALL SELECT 2, count(*) FROM s2
      UNION ALL SELECT 3, count(*) FROM s3
    ) ORDER BY stage
    """,
    category="analytics",
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered event funnel (signup → first later click → first later
    purchase): per-stage user counts with strict temporal sequencing —
    the event-analytics staple (MATCH_RECOGNIZE-lite) the events table
    exists for.

    Sequencing by first-qualifying-timestamp chain: each stage is a
    per-user MIN over events later than the previous stage's timestamp.
    Every stage shuffles on user_id, so all three aggregates and both
    joins share one partitioning — Catalyst plans the stage-2/3 joins
    without re-exchanging the (already user-keyed) stage frames, and the
    per-stage frames shrink monotonically (funnel property). At 100 TB
    the event scan is filtered to the three funnel event types before any
    shuffle.
    """
    ev = load_table(spark, sf, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [
        df.agg(F.count("*").alias("users")).select(
            F.lit(i).alias("stage"), F.col("users")
        )
        for i, df in ((1, s1), (2, s2), (3, s3))
    ]
    return counts[0].unionAll(counts[1]).unionAll(counts[2]).orderBy("stage")


@query(
    "q101_purchase_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'purchase'
    ),
    islands AS (
      SELECT user_id, day,
             date_diff('day', DATE '2024-01-01', day)
             - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, island, count(*) AS streak_len
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(max(streak_len) AS BIGINT) AS longest_streak,
           CAST(sum(streak_len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
    category="analytics",
)
def q101(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands: longest run of CONSECUTIVE calendar days with a
    purchase, per user — the row_number-difference idiom (day_ordinal −
    rank is constant exactly within a consecutive run), the other classic
    sequence shape next to q70's time-gap sessionization.

    Three aggregates, all keyed on user_id (one partitioning reused
    across the window and both groupBys — no re-exchange): distinct
    (user, day) dedup, island sizing, per-user max. Nothing is ordered
    globally and no self-join materializes day pairs, so the plan is
    shuffle-bounded by distinct active days, not events.
    """
    ev = load_table(spark, sf, "events").filter(F.col("event_type") == "purchase")
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    islands = days.withColumn(
        "island",
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")) - rn,
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("streak_len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("streak_len").alias("longest_streak"),
            F.sum("streak_len").alias("n_active_days"),
        )
        .orderBy("user_id")
    )


@query(
    "q102_scd2_history",
    oracle="""
    WITH upd AS (
      SELECT user_id, ts, event_id, value,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type = 'purchase'
    ),
    chg AS (
      SELECT user_id, ts, event_id, value FROM upd
      WHERE prev IS NULL OR value <> prev
    )
    SELECT user_id,
           CAST(row_number() OVER w AS INT) AS version,
           ROUND(value, 4) AS value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, version
    """,
    category="warehouse",
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    """SCD Type-2 history build: an attribute-update stream becomes
    versioned dimension rows with [valid_from, valid_to) intervals and an
    is_current flag — the warehouse-standard temporal-dimension shape
    next to q73's MERGE. Consecutive duplicate values collapse (only
    real changes open a new version); the open interval (valid_to NULL)
    marks the current row.

    One shuffle on the dimension key serves all three windows (change
    detection, versioning, interval close); nothing orders globally but
    the presentation sort. At 100 TB the update stream is incremental:
    the same plan applied to (current open rows UNION new updates)
    closes old intervals and opens new ones batch by batch.
    """
    upd = (
        load_table(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chg = upd.withColumn("prev", F.lag("value").over(w)).filter(
        F.col("prev").isNull() | (F.col("value") != F.col("prev"))
    )
    return (
        chg.select(
            "user_id",
            F.row_number().over(w).cast("int").alias("version"),
            F.round("value", 4).alias("value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


@query(
    "q103_cohort_retention",
    oracle="""
    WITH firstw AS (
      SELECT user_id, CAST(min(date_trunc('week', ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                            date_trunc('week', e.ts)) AS INT) AS week_no
      FROM events e JOIN firstw f ON e.user_id = f.user_id
    ),
    cohort_size AS (
      SELECT cohort_week, count(*) AS n_users FROM firstw GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_no,
           CAST(count(*) AS BIGINT) AS active_users,
           ROUND(count(*) * 1.0 / s.n_users, 4) AS retention
    FROM activity a JOIN cohort_size s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_no, s.n_users
    ORDER BY a.cohort_week, week_no
    """,
    category="analytics",
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    fraction still active N weeks later — the product-analytics staple
    (triangle chart) closing the funnel/streak/sessionization family.

    Three aggregates keyed on user_id / cohort_week: first-week per user
    (one shuffle on user), a distinct (user, week_no) activity dedup
    riding the same user partitioning via the cohort join, and the final
    per-(cohort, week) rollup over already-small rows; cohort sizes
    broadcast. Nothing scans events twice at the executor level beyond
    the two aggregates Catalyst can't merge (first-week vs activity),
    and no window needs global order.
    """
    e = load_table(spark, sf, "events")
    firstw = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(firstw, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("week_no"),
        )
        .distinct()
    )
    sizes = firstw.groupBy("cohort_week").agg(F.count("*").alias("n_users"))
    return (
        activity.groupBy("cohort_week", "week_no")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_no",
            "active_users",
            F.round(F.col("active_users") * 1.0 / F.col("n_users"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_no")
    )


# ------------------------------------------------------ touch attribution


@query(
    "q110_last_touch_attribution",
    oracle="""
    WITH attributed AS (
      SELECT event_id, user_id, event_type, ts,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS click_id,
             last_value(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS click_ts
      FROM events
    )
    SELECT event_id AS purchase_id, user_id,
           click_id AS attributed_click,
           CAST(floor(epoch(ts)) - floor(epoch(click_ts)) AS BIGINT)
             AS delay_sec
    FROM attributed WHERE event_type = 'purchase'
    ORDER BY purchase_id
    """,
    category="events",
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent preceding click (NULL when none exists yet), with the
    click-to-purchase delay in seconds — the conversion-analytics shape
    that q70 (sessionization) and q100 (funnel) don't cover: a
    carry-forward join within the event stream rather than a gap split
    or a stage count.

    Plan: one shuffle on user_id for the running ``last(..., ignorenulls)``
    window (the standard carry-forward idiom — no self-join, no as-of
    join against a separate click table), then a filter to purchases.
    The delay subtracts two unix timestamps, so any session timezone
    cancels; the NULL attribution propagates through it untouched. Both
    engines FLOOR to whole seconds before subtracting (the q66 idiom —
    ``unix_timestamp`` truncates sub-second, DuckDB's ``epoch`` keeps
    it, and CASTing the raw difference would round-half-even a
    sub-second residue into ±1 s diffs).
    """
    e = load_table(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    is_click = F.col("event_type") == "click"
    attributed = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("attributed_click"),
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("click_ts"),
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "attributed_click",
            (
                F.unix_timestamp("ts") - F.unix_timestamp("click_ts")
            ).alias("delay_sec"),
        )
        .orderBy("purchase_id")
    )
