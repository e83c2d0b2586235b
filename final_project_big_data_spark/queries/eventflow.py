"""Event-stream & time-series batch shapes (split from extras.py,
round 11 — zero plan/oracle changes): gap sessionization, linear
interpolation, time-weighted averages, conversion funnels, purchase
streaks, SCD2 history reconstruction, cohort retention and last-touch
attribution — the batch twins of the streaming C10-C13 surface, all over
the ``events``/``orders`` fixtures. Same Tier-A conventions as
``stats.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.queries import query

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
