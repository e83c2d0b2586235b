"""Statistical aggregates, exact percentiles, list aggregation, pivot and
null-handling scalars — completeness extensions beyond SURVEY §2.4's
letter queries (same Tier-A conventions: total ORDER BY, ROUND(·,4),
matching column names both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.plans.money import money_sum, money_sum_sql
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
    """Exact interpolated percentiles per group == DuckDB
    ``quantile_cont``, via the distributed counting formulation
    (``operators/quantiles.py``).

    Round 6: moved OFF Spark's built-in ``percentile`` — its object
    aggregate buffers a per-group counts-map keyed by value, which the
    1000× sweep showed GC-thrashing on value-rich columns (q56's
    post-mortem). The counting form's memory is bounded by distinct
    values per group at every stage; ``percentile_approx`` (a02) remains
    the sketch path for genuinely continuous 100 TB columns.
    """
    from final_project_big_data_spark.operators.quantiles import (
        exact_quantile_cont,
    )

    qdf = exact_quantile_cont(
        load_table(spark, sf, "orders"),
        ["o_orderpriority"],
        "o_totalprice",
        {"p25_raw": 0.25, "p50_raw": 0.50, "p75_raw": 0.75},
    )
    return qdf.select(
        "o_orderpriority",
        F.round("p25_raw", 4).alias("p25"),
        F.round("p50_raw", 4).alias("p50"),
        F.round("p75_raw", 4).alias("p75"),
    ).orderBy("o_orderpriority")


@query(
    "q43_collect_list",
    oracle="""
    SELECT r_name,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    category="aggregate",
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    """List aggregation: ``sort_array(collect_list())`` == DuckDB
    ``list_sort(list())`` (sorted for partition-order independence).

    The list is emitted joined to a CSV string: raw ``array<string>``
    output columns are unhashable in pandas-based result canonicalizers
    (driver round-3 finding), so scalarize at the output boundary.
    """
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("n_name")), ","
            ).alias("nations")
        )
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


@query(
    "q46_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
           CAST(last_day(o_orderdate) AS DATE) AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(dayofyear(o_orderdate) AS INT) AS doy
    FROM orders ORDER BY o_orderkey
    """,
    category="scalar",
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    """Date arithmetic: datediff / interval add / last_day / quarter / doy."""
    from final_project_big_data_spark.plans.ordering import sorted_project

    o = load_table(spark, sf, "orders")
    return sorted_project(
        o,
        ["o_orderkey"],
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("doy"),
    )


@query(
    "q47_conditional_agg",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
           {money_sum_sql(
               'CASE WHEN l_discount > 0.05 THEN l_extendedprice END'
           )}
             AS disc_rev,
           round(AVG(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS avg_f_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    category="aggregate",
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional aggregation (FILTER / CASE inside aggregates) — one pass,
    map-side combinable; the idiom that replaces N filtered sub-queries.
    The filtered money sum accumulates as unscaled BIGINT (plans.money):
    exact and order-independent like round 4's DECIMAL fix for the ~5e10
    10x-volume drift, but on the primitive codegen path. The oracle
    mirrors the when() as CASE (NULLs skip the sum on both engines)."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
            money_sum(
                F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
            ).alias("disc_rev"),
            F.round(
                F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 4
            ).alias("avg_f_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q48_string_array_ops",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(string_split(substr(text, 1, 50), ' ')), '|')
             AS sorted_words,
           string_split(text, ' ')[2] AS second_word,
           CAST(len(string_split(text, ' ')) AS INT) AS n_parts
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
    category="array",
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    """split / array_sort / array_join / element_at over document text."""
    from final_project_big_data_spark.plans.ordering import sorted_project

    d = load_table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    parts = F.split(F.col("text"), " ", -1)
    return sorted_project(
        d,
        ["doc_id"],
        "doc_id",
        F.array_join(
            F.array_sort(F.split(F.substring(F.col("text"), 1, 50), " ", -1)), "|"
        ).alias("sorted_words"),
        F.element_at(parts, 2).alias("second_word"),
        F.size(parts).alias("n_parts"),
    )


@query(
    "q49_window_extras",
    oracle="""
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING), 4) AS nearby_sum,
           first_value(o_totalprice) OVER w AS fv,
           last_value(o_totalprice) OVER w AS lv,
           nth_value(o_totalprice, 2) OVER w AS nv,
           round(percent_rank() OVER w2, 4) AS pr,
           round(cume_dist() OVER w2, 4) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    category="window",
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    """Window completeness: value-RANGE frame, first/last/nth_value,
    percent_rank, cume_dist.

    The RANGE frame sums neighbors within ±1000.0 of each row's price —
    frame membership is by value, so results are tie-order independent;
    the ROWS windows use unique-key orderings for determinism.
    """
    from pyspark.sql import Window as W

    o = load_table(spark, sf, "orders")
    # float RANGE bounds need the SQL form (PySpark's rangeBetween is
    # long-only); same Catalyst SpecifiedWindowFrame either way
    nearby = F.expr(
        "sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice"
        " RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)"
    )
    w_full = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w_rank = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(nearby, 4).alias("nearby_sum"),
        F.first("o_totalprice").over(w_full).alias("fv"),
        F.last("o_totalprice").over(w_full).alias("lv"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("nv"),
        F.round(F.percent_rank().over(w_rank), 4).alias("pr"),
        F.round(F.cume_dist().over(w_rank), 4).alias("cd"),
    ).orderBy("o_orderkey")


@query(
    "q50_map_fns",
    oracle="""
    SELECT o_orderkey,
           (map {'status': o_orderstatus, 'prio': o_orderpriority})['status'][1]
             AS status,
           (map {'status': o_orderstatus, 'prio': o_orderpriority})['prio'][1]
             AS prio,
           CAST(cardinality(map {'status': o_orderstatus,
                                 'prio': o_orderpriority}) AS INT) AS n_keys
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
    category="map",
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    """MapType construction + key access + cardinality (no map columns in
    the fixtures, so the map is built from scalars — the operator surface
    is what's declared)."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 500)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("prio"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        m["status"].alias("status"),
        m["prio"].alias("prio"),
        F.size(m).alias("n_keys"),
    ).orderBy("o_orderkey")


@query(
    "q51_higher_order_fns",
    oracle="""
    SELECT vec_id,
           round(list_reduce(embedding::DOUBLE[], (a, b) -> a + b), 4) AS vsum,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INT) AS n_pos,
           round(list_transform(embedding::DOUBLE[], x -> x * 2.0)[1], 4) AS first_x2
    FROM embeddings WHERE vec_id < 100 ORDER BY vec_id
    """,
    category="array",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions: reduce / filter / transform with
    lambdas (the JVM-side alternative to a Python UDF over arrays)."""
    e = load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 100)
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vsum"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.element_at(F.transform(v, lambda x: x * 2.0), 1), 4
        ).alias("first_x2"),
    ).orderBy("vec_id")


@query(
    "q52_explode_outer",
    oracle="""
    SELECT vec_id, round(u.v, 4) AS val
    FROM (SELECT vec_id, CASE WHEN vec_id % 3 = 0 THEN [NULL]
               ELSE embedding[1:(vec_id % 3)]::DOUBLE[] END AS l
          FROM embeddings WHERE vec_id < 60) t,
         UNNEST(t.l) AS u(v)
    ORDER BY vec_id
    """,
    category="array",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    """``explode_outer``: rows with empty arrays survive as NULL rows
    (plain explode drops them — the silent-data-loss hazard in fan-outs).
    The oracle emulates outer-unnest with a CASE→[NULL] rewrite."""
    e = load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 60)
    arr = F.slice(
        F.transform("embedding", lambda x: x.cast("double")),
        1,
        (F.col("vec_id") % 3).cast("int"),
    )
    return (
        e.select("vec_id", F.explode_outer(arr).alias("raw"))
        .select("vec_id", F.round("raw", 4).alias("val"))
        .orderBy("vec_id")
    )


@query(
    "q53_unpivot",
    oracle="""
    SELECT o_orderkey, name, value FROM (
      SELECT o_orderkey, o_totalprice AS price, CAST(o_custkey AS DOUBLE) AS cust
      FROM orders WHERE o_orderkey < 1000)
    UNPIVOT (value FOR name IN (price, cust))
    ORDER BY o_orderkey, name
    """,
    category="reshape",
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (wide→long), the inverse of q44's pivot. Narrow transform,
    no shuffle — rows out = rows in × #value columns."""
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.col("o_custkey").cast("double").alias("cust"),
        )
    )
    return o.unpivot(
        ids=["o_orderkey"],
        values=["price", "cust"],
        variableColumnName="name",
        valueColumnName="value",
    ).orderBy("o_orderkey", "name")


@query(
    "q54_try_cast",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INT) AS prio_int,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit
    FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey
    """,
    category="scalar",
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    """``try_cast``: malformed input → NULL instead of a job-killing error
    — the difference between one bad record and a failed 100 TB job."""
    o = load_table(spark, sf, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("prio_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
    ).orderBy("o_orderkey")


@query(
    "q55_gap_fill",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             count(*) AS cnt, round(avg(value), 4) AS avg_value
      FROM events WHERE value > 300 GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    spine AS (
      SELECT CAST(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
                                         INTERVAL 1 DAY)) AS DATE) AS day,
             et.event_type
      FROM bounds, (SELECT DISTINCT event_type FROM events) et
    )
    SELECT s.day, s.event_type,
           coalesce(d.cnt, 0) AS cnt,
           last_value(d.avg_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.day) AS filled_avg
    FROM spine s LEFT JOIN d USING (day, event_type)
    ORDER BY event_type, day
    """,
    category="timeseries",
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    """Time-spine gap fill: dense (day, event_type) grid via ``sequence`` +
    ``explode`` from a broadcast 1-row bounds aggregate, zero-filled counts,
    forward-filled averages (``last(ignorenulls)`` running window).

    Scale: the spine is #days × #types rows built from a broadcast scalar —
    never a driver loop; the left join shuffles on (day, type) like any agg;
    the ffill window partitions by type (bounded state per key).
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf, "events")
    d = (
        # the >300 predicate makes the (day, type) grid genuinely sparse in
        # the fixtures, so the zero-fill and ffill paths do real work
        e.filter(F.col("value") > 300)
        .groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    types = e.select("event_type").distinct()
    spine = (
        types.join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
        )
    )
    w = W.partitionBy("event_type").orderBy("day")
    return (
        spine.join(d, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_avg"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "q78_time_range_window",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    )
    SELECT event_id,
           CAST(count(*) OVER w AS BIGINT) AS trailing_cnt,
           ROUND(sum(value) OVER w, 4) AS trailing_sum
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    category="window",
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    """Time-based RANGE frame: per user, count/sum of events in the
    trailing 10 minutes of *event time* (the rate-limit / burst-detection
    window). Completes q49's value-RANGE with the time-interval case.

    Frame membership is defined on epoch seconds on BOTH engines (Spark's
    ``rangeBetween`` takes long offsets; DuckDB orders by the same
    truncated-second column), so ties inside one second are
    frame-inclusive and the result is order-independent. One shuffle on
    user_id; the running frame is a single sort within partitions — no
    self-join materializes the 10-minute neighborhood.
    """
    from pyspark.sql import Window as W

    e = load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "value",
        F.unix_timestamp("ts").alias("sec"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-600, W.currentRow)
    )
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("trailing_cnt"),
        F.round(F.sum("value").over(w), 4).alias("trailing_sum"),
    ).orderBy("event_id")
