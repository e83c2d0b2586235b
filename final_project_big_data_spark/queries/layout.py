"""Data-layout & maintenance operators for the 100 TB design point:
Z-order clustering (multi-dimensional data skipping), incremental
aggregate maintenance (mergeable partial states), and runtime min/max
join reduction (the dynamic-filter analogue for non-partition keys).

The reference has no layout management at all (SURVEY §2.1 — its
prepare step writes one unpartitioned parquet,
``tasks/scripts/prepare_data.py:31-34``); these operators are part of
the generalized at-scale contract: a 100 TB table is only as fast as
the bytes its scans can SKIP, and a 100 TB aggregate is only
maintainable if yesterday's result merges with today's delta instead
of rescanning the base.

Same Tier-A conventions as ``extras.py``: total ORDER BY with unique
tiebreak, ROUND(·,4) on floating aggregates, identical column names on
both sides of every oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from final_project_big_data_spark.io import compact_files, load_table
from final_project_big_data_spark.operators.zorder import zvalue, zvalue_sql
from final_project_big_data_spark.queries import query

_Z_BUCKET_SHIFT = 16  # one "file" per 2^16 z-cells
_zvalue_sql = zvalue_sql  # oracle-side twin (operators/zorder.py)


@query(
    "q104_zorder_layout",
    oracle=f"""
    SELECT CAST({_zvalue_sql('l_partkey', 'l_suppkey')} >> {_Z_BUCKET_SHIFT}
                AS BIGINT) AS z_bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(min(l_partkey) AS BIGINT) AS pk_min,
           CAST(max(l_partkey) AS BIGINT) AS pk_max,
           CAST(min(l_suppkey) AS BIGINT) AS sk_min,
           CAST(max(l_suppkey) AS BIGINT) AS sk_max
    FROM lineitem
    GROUP BY 1 ORDER BY z_bucket
    """,
    category="layout",
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order clustering: interleave (l_partkey, l_suppkey) into a
    Morton code and report the per-z-bucket (partkey, suppkey) bounding
    box. Each z_bucket stands for one output file of a
    ``repartitionByRange(zval).sortWithinPartitions(zval)`` rewrite —
    the tight per-bucket min/max boxes this query emits ARE the
    data-skipping index: a later scan filtering on EITHER dimension
    prunes whole files from footer stats alone, which a single-column
    sort only provides for its leading key. One hash-agg shuffle on the
    bucket id; the z-value itself is codegen'd bit math (no UDF).
    ``tests/test_io_engine.py::test_zorder_layout_skips_both_dims``
    proves the payoff against a natural-order layout.
    """
    li = load_table(spark, sf, "lineitem")
    z = zvalue(F.col("l_partkey"), F.col("l_suppkey"))
    return (
        li.select(
            F.shiftright(z, _Z_BUCKET_SHIFT).alias("z_bucket"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("l_partkey").alias("pk_min"),
            F.max("l_partkey").alias("pk_max"),
            F.min("l_suppkey").alias("sk_min"),
            F.max("l_suppkey").alias("sk_max"),
        )
        .orderBy("z_bucket")
    )


# the delta slice: one orderkey residue class ≈ 10% of the fact table
_DELTA_PRED = "l_orderkey % 10 = 7"


@query(
    "q105_incremental_agg",
    oracle=f"""
    WITH base AS (SELECT * FROM lineitem WHERE NOT ({_DELTA_PRED})),
    delta AS (SELECT * FROM lineitem WHERE {_DELTA_PRED}),
    pb AS (
      SELECT l_returnflag, l_linestatus,
             count(*) AS cnt, sum(CAST(l_quantity AS BIGINT)) AS sq,
             min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
      FROM base GROUP BY 1, 2
    ),
    pd AS (
      SELECT l_returnflag, l_linestatus,
             count(*) AS cnt, sum(CAST(l_quantity AS BIGINT)) AS sq,
             min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
      FROM delta GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum(cnt) AS BIGINT) AS row_cnt,
           CAST(sum(sq) AS BIGINT) AS sum_qty,
           CAST((sum(sq) * 10000) // sum(cnt) AS BIGINT) AS avg_qty_e4,
           ROUND(min(mn), 4) AS min_price,
           ROUND(max(mx), 4) AS max_price
    FROM (SELECT * FROM pb UNION ALL SELECT * FROM pd)
    GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus
    """,
    category="layout",
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental aggregate maintenance: yesterday's materialized
    PARTIAL states (count/sum/min/max per group, computed on the base
    slice) merge with today's delta slice's partials by a second
    group-by over the union — count and sum re-sum, min/max re-min/max,
    and avg is DERIVED at merge time as sum/count (never averaged
    averages). Semantically identical to a full recompute — the oracle
    builds the same two partials and merges them, so what is verified
    is the merge algebra itself. At 100 TB this is the difference
    between rescanning the base table daily and touching only the
    delta: the merge input is |groups| rows, not |rows|. Quantities sum
    on the exact integer path (they are integral); the derived average
    is published as an e4 integer (``sum*10000 DIV cnt``) — exact in
    both engines, no float-division drift. The delta predicate stands
    in for an ingest partition boundary.
    """
    li = load_table(spark, sf, "lineitem")
    delta_pred = F.col("l_orderkey") % 10 == 7

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("long")).alias("sq"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )

    merged = partial(li.filter(~delta_pred)).unionAll(
        partial(li.filter(delta_pred))
    )
    return (
        merged.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("cnt").alias("row_cnt"),
            F.sum("sq").alias("sum_qty"),
            F.expr("(sum(sq) * 10000) DIV sum(cnt)").alias("avg_qty_e4"),
            F.round(F.min("mn"), 4).alias("min_price"),
            F.round(F.max("mx"), 4).alias("max_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q106_runtime_bounds_join",
    oracle="""
    WITH dim AS (
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey < 1500
    )
    SELECT d.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem l JOIN dim d ON l.l_orderkey = d.o_orderkey
    GROUP BY 1 ORDER BY o_orderpriority
    """,
    category="layout",
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    """Runtime min/max join reduction (the dynamic-filter pattern for
    non-partition keys): before joining the fact table to a filtered
    dimension slice, compute the slice's key bounds as a 1-row
    aggregate, broadcast it, and pre-filter fact rows to
    ``key BETWEEN lo AND hi`` — the bounds are computed AT RUNTIME from
    the dim predicate, exactly like Spark's InjectRuntimeFilter /
    dynamic partition pruning, but expressed for an arbitrary sort-
    correlated key. Because appended facts carry monotonically growing
    keys, a "recent slice" dim prunes the overwhelming share of fact
    bytes before the join shuffle (here ~90%: orderkey < 1500 of
    ~15k·sf). The reduction is semantics-free — the oracle runs the
    plain join — and fully lazy: the bounds ride a broadcast nested-
    loop of a single aggregate row, no driver collect
    (``tests/test_plans.py`` pins the filter-below-join shape).
    """
    li = load_table(spark, sf, "lineitem")
    dim = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderkey") < 1500)
        .select("o_orderkey", "o_orderpriority")
    )
    bounds = dim.agg(
        F.min("o_orderkey").alias("k_lo"), F.max("o_orderkey").alias("k_hi")
    )
    reduced = (
        li.select("l_orderkey", "l_quantity")
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("l_orderkey").between(F.col("k_lo"), F.col("k_hi")))
    )
    # no broadcast hint on the main join: the pattern exists precisely for
    # dim slices too large to broadcast (Catalyst/AQE still picks BHJ when
    # the slice is small, as here; the bounds pre-filter pays either way
    # by shrinking the fact rows that reach the join)
    return (
        reduced.join(dim, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


# q107's compaction slice: one fixed key range, so the entry's write work
# is CONSTANT at any sweep volume (the scale probes shift keys per copy —
# only copy 0 falls below the bound) while the byte-derived sizing math
# is exercised for real
_COMPACT_PRED = 3000
_COMPACT_FRAGMENTS = 16


@query(
    "q107_compaction_maintenance",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS row_cnt,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           TRUE AS files_reduced,
           TRUE AS right_sized
    FROM orders WHERE o_orderkey < {_COMPACT_PRED}
    """,
    category="layout",
)
def q107(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction as a driver-checked maintenance op
    (round 9, VERDICT r8 #4 — ``io.compact_files`` had pytest-only
    evidence): fragment an orders slice into 16 small
    files the way a streaming sink or per-task writer would, run the
    size-derived compaction rewrite, and publish the facets the oracle
    can falsify — exact row count / key sum / customer cardinality of
    the COMPACTED copy (any lost or duplicated row flips the hash) plus
    files_reduced (the rewrite actually shrank the file count) and
    right_sized (the files on disk match the byte-derived plan,
    ``ceil(bytes / target)``). Eager by contract (EAGER_BY_CONTRACT):
    compaction IS a write job — the 100 TB posture notes live on
    ``io.compact_files`` itself.
    """

    def _files(p: str) -> int:
        return sum(
            1
            for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )

    # deterministic per-corpus path (NOT mkdtemp): both writes below are
    # mode("overwrite"), so repeated invocations reuse one directory
    # instead of accumulating litter
    import hashlib

    work = os.path.join(
        tempfile.gettempdir(),
        f"q107_compact_{hashlib.md5(sf.encode()).hexdigest()[:12]}",
    )
    src = os.path.join(work, "fragmented")
    dst = os.path.join(work, "compacted")
    (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderkey") < _COMPACT_PRED)
        .select("o_orderkey", "o_custkey")
        .repartition(_COMPACT_FRAGMENTS)
        .write.mode("overwrite")
        .parquet(src)
    )
    n_before = _files(src)
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _d, files in os.walk(src)
        for f in files
        if not f.startswith((".", "_"))
    )
    # target ≈ quarter of the slice → a handful of right-sized files
    planned = compact_files(
        spark, src, dst, target_file_bytes=max(1, -(-total // 4))
    )
    n_after = _files(dst)
    return spark.read.parquet(dst).agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.sum("o_orderkey").alias("key_sum"),
        F.countDistinct("o_custkey").alias("n_cust"),
        F.lit(n_after < n_before).alias("files_reduced"),
        F.lit(n_after == planned).alias("right_sized"),
    )


# ---------------------------------------------------------- MERGE / upsert


@query(
    "q108_merge_upsert",
    oracle="""
    WITH snap AS (
      SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      WHERE c_custkey % 5 <> 0
    ),
    ch AS (
      SELECT o_custkey AS k, o_orderstatus, o_totalprice
      FROM (
        SELECT o_custkey, o_orderstatus, o_totalprice,
               row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
      ) WHERE rn = 1
    ),
    merged AS (
      SELECT COALESCE(s.c_custkey, c.k) AS c_custkey,
             CASE WHEN c.k IS NULL THEN s.c_acctbal
                  ELSE c.o_totalprice END AS bal,
             CASE WHEN s.c_custkey IS NULL THEN 'NEW'
                  ELSE s.c_mktsegment END AS c_mktsegment,
             CASE WHEN c.k IS NULL THEN 'kept'
                  WHEN s.c_custkey IS NULL THEN 'inserted'
                  ELSE 'updated' END AS action,
             c.o_orderstatus AS st
      FROM snap s FULL OUTER JOIN ch c ON s.c_custkey = c.k
    )
    SELECT c_custkey, ROUND(bal, 2) AS c_acctbal, c_mktsegment, action
    FROM merged WHERE st IS NULL OR st <> 'F'
    ORDER BY c_custkey
    """,
    category="layout",
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO (CDC upsert apply): latest-change-wins application of a
    change stream onto a snapshot, exercising all three branches — WHEN
    MATCHED UPDATE, WHEN MATCHED AND op='delete' DELETE, WHEN NOT MATCHED
    INSERT (unmatched deletes are no-ops, per standard MERGE).

    Snapshot = customers with ``c_custkey % 5 <> 0`` (a stale copy, so
    some change keys are genuinely new at every SF); change stream = each
    customer's LATEST order in the trailing CDC window (o_orderdate ≥
    2001-01-01 — most snapshot keys see no change and pass through as
    'kept'; final status 'F' → delete, else upsert of the order total as
    the new balance).

    Scale shape: latest-per-key is ``max(struct(ordering, payload))`` —
    ONE hash-agg with map-side partial merge, deliberately not a
    row_number window (a window must shuffle+sort every change row; the
    struct-max agg reduces per partition first, which is the difference
    at a 100 TB change log). The apply itself is one full-outer
    shuffle-hash join on the key — at scale both sides would be bucketed
    on c_custkey so the merge never re-shuffles the snapshot. The oracle
    states the SAME semantics the conventional way (row_number = 1 +
    FULL OUTER JOIN), so the agg rewrite is value-checked against the
    textbook form.
    """
    snap = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") % 5 != 0)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
    )
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    latest = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.max(
            F.struct("o_orderdate", "o_orderkey", "o_orderstatus", "o_totalprice")
        ).alias("ch")
    ).select("k", "ch.o_orderstatus", "ch.o_totalprice")
    m = snap.join(latest, snap.c_custkey == latest.k, "full_outer")
    return (
        m.select(
            F.coalesce("c_custkey", "k").alias("c_custkey"),
            F.round(
                F.when(F.col("k").isNull(), F.col("c_acctbal")).otherwise(
                    F.col("o_totalprice")
                ),
                2,
            ).alias("c_acctbal"),
            F.when(F.col("c_custkey").isNull(), F.lit("NEW"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            F.when(F.col("k").isNull(), F.lit("kept"))
            .when(F.col("c_custkey").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("action"),
            F.col("o_orderstatus").alias("st"),
        )
        .filter(F.col("st").isNull() | (F.col("st") != "F"))
        .drop("st")
        .orderBy("c_custkey")
    )


# ------------------------------------------------------------- ORC surface

_ORC_PRED = 3000


@query(
    "q109_orc_roundtrip",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS row_cnt,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status,
           ROUND(sum(o_totalprice), 2) AS price_sum
    FROM orders WHERE o_orderkey < {_ORC_PRED}
    """,
    category="source",
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    """ORC write→read roundtrip: the columnar-format surface beyond
    parquet/CSV/JSON (ORC support ships in Spark core — predicate
    pushdown, column pruning, and vectorized reads all apply). A slice
    of ``orders`` is written as ORC and read back; the oracle computes
    the same facets from the parquet source, so the value-hash proves
    the roundtrip is lossless for every column type it carries (int64
    keys, varchar, double money, timestamp partitioning survives the
    format's own encodings). Deterministic per-corpus path with
    mode("overwrite"), same litter discipline as q107.
    """
    import hashlib

    work = os.path.join(
        tempfile.gettempdir(),
        f"q109_orc_{hashlib.md5(sf.encode()).hexdigest()[:12]}",
    )
    (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderkey") < _ORC_PRED)
        .write.mode("overwrite")
        .orc(work)
    )
    back = spark.read.orc(work).filter(F.col("o_orderkey") < _ORC_PRED)
    return back.agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.sum("o_orderkey").alias("key_sum"),
        F.countDistinct("o_orderstatus").alias("n_status"),
        F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
    )


# ------------------------------------------------------ partition pruning

_PRUNE_YEAR = 1997


@query(
    "q111_partition_pruned_scan",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS row_cnt,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM orders WHERE CAST(year(o_orderdate) AS INT) = {_PRUNE_YEAR}
    """,
    category="layout",
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-pruned scan as a driver-checked contract: ``orders`` is
    rewritten hive-partitioned by order year (``io.write_parquet``'s
    partition_by — the 100 TB layout knob the reference never used,
    SURVEY §2.1 O6), then queried for ONE year. The year predicate
    resolves at PLANNING time against directory names — the scan's
    PartitionFilters prune six of seven year directories before any
    file IO (pinned by the executed-plan test in
    tests/test_round9_ops.py), which at 100 TB is the difference
    between reading one year and reading the decade. The oracle
    computes the same facets from the unpartitioned source, proving the
    partitioned rewrite loses no rows and the pruned scan reads exactly
    the right ones.
    """
    import hashlib

    from final_project_big_data_spark.io import write_parquet

    work = os.path.join(
        tempfile.gettempdir(),
        f"q111_part_{hashlib.md5(sf.encode()).hexdigest()[:12]}",
    )
    o = load_table(spark, sf, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    write_parquet(o, work, partition_by=["o_year"])
    back = spark.read.parquet(work).filter(
        F.col("o_year") == _PRUNE_YEAR
    )
    return back.agg(
        F.count(F.lit(1)).alias("row_cnt"),
        F.sum("o_orderkey").alias("key_sum"),
        F.countDistinct("o_custkey").alias("n_cust"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "price_cents"
        ),
    )


# --------------------------------------------- dynamic partition pruning

_DPP_BASE_YEAR = 1995


@query(
    "q112_dynamic_partition_pruning",
    oracle=f"""
    WITH dim AS (
      SELECT DISTINCT CAST({_DPP_BASE_YEAR} + c_custkey % 3 AS INT) AS y
      FROM customer WHERE c_custkey % 1000 = 7
    )
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(count(*) AS BIGINT) AS row_cnt,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM orders JOIN dim ON CAST(year(o_orderdate) AS INT) = dim.y
    GROUP BY 1 ORDER BY o_year
    """,
    category="layout",
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic partition pruning: q111 proved PLANNING-time pruning
    against a literal; this is the cluster-scale sibling where the
    partitions to keep are only known at RUNTIME — the fact is joined
    on its partition column to a dim whose qualifying keys come from a
    scan. Spark broadcasts the dim and injects
    ``dynamicpruningexpression(o_year IN dynamicpruning#N)`` into the
    fact scan's PartitionFilters (pinned by the plan test), so the 100 TB
    fact reads only the dim-selected year directories — the star-schema
    pattern where static pruning can't help because the filter lives on
    the dimension table. The oracle states the same join against the
    unpartitioned source.
    """
    import hashlib

    from final_project_big_data_spark.io import write_parquet

    work = os.path.join(
        tempfile.gettempdir(),
        f"q112_dpp_{hashlib.md5(sf.encode()).hexdigest()[:12]}",
    )
    o = load_table(spark, sf, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    write_parquet(o, work, partition_by=["o_year"])
    fact = spark.read.parquet(work)
    dim = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_custkey") % 1000 == 7)
        .select(
            (F.lit(_DPP_BASE_YEAR) + F.col("c_custkey") % 3)
            .cast("int")
            .alias("y")
        )
        .distinct()
    )
    return (
        fact.join(dim, fact.o_year == dim.y)
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("row_cnt"),
            F.sum("o_orderkey").alias("key_sum"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "price_cents"
            ),
        )
        .orderBy("o_year")
    )


# ------------------------------------------------- cost-based optimization

_CBO_TABLES = ("lineitem", "orders", "supplier", "part", "nation")


def _q113_sql(prefix: str = "") -> str:
    """The deliberately badly-ordered 5-way join: the fact joins the OTHER
    fact (orders) first and meets the selective dim (part, LIKE-filtered
    to ~1/6) last — the syntactic order a naive query author writes.
    ``prefix`` qualifies table names with the stats database on the Spark
    side; the oracle runs the same text over DuckDB's views (its own
    optimizer reorders freely — join order never changes the result)."""
    p = prefix
    return f"""
    SELECT n.n_name AS n_name,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM {p}lineitem l
    JOIN {p}orders o   ON l.l_orderkey = o.o_orderkey
    JOIN {p}supplier s ON s.s_suppkey = l.l_suppkey
    JOIN {p}part p     ON p.p_partkey = l.l_partkey
    JOIN {p}nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name
    ORDER BY n_name
    """


@query(
    "q113_cbo_join_reorder",
    oracle=_q113_sql(),
    category="optimizer",
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    """Cost-based join reordering as a driver-checked contract (round 11,
    SURVEY §4.2's last unexercised row).

    The fixture tables are registered as external catalog tables with
    ``ANALYZE TABLE ... FOR ALL COLUMNS`` stats (io.register_stats_tables),
    then the badly-ordered join above runs under ``spark.sql.cbo.enabled``
    + ``spark.sql.cbo.joinReorder.enabled``: Catalyst's DP reorder uses
    the measured row counts / NDVs to move the LIKE-filtered ``part``
    dimension BELOW the lineitem⋈orders fact-fact join — the plan change
    AQE alone can never make (AQE switches strategies and coalesces
    partitions at runtime but never changes the join order the optimizer
    committed to; pinned by tests/test_cbo.py). At 100 TB, joining the
    selective dim first is the difference between shuffling every
    lineitem row into the orders join and shuffling ~1/6 of them.

    CBO confs are session-global, so the builder executes the plan
    eagerly under the flipped confs (``localCheckpoint``) and restores
    them before returning — the shared-session sweep never sees CBO
    enabled (eager-by-contract, like the q111 write jobs). The oracle
    checks the reordered plan computes the identical result.
    """
    from final_project_big_data_spark.io import register_stats_tables

    db = register_stats_tables(spark, sf, list(_CBO_TABLES))
    old = {
        k: spark.conf.get(k, "false")
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    try:
        for k in old:
            spark.conf.set(k, "true")
        return spark.sql(_q113_sql(f"{db}.")).localCheckpoint(eager=True)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
