"""plans.metrics: observe-based counters ride the job instead of re-scanning."""

from __future__ import annotations

from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.plans.metrics import curation_metrics, observed


def test_observed_metrics_match_direct_aggregates(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    dd, obs = curation_metrics(d)
    n_out = dd.filter(F.col("n_chars") > 100).count()  # the ONE action
    got = obs.get
    want = d.agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
    ).collect()[0]
    assert got["rows_in"] == want.rows_in
    assert got["null_text"] == want.null_text
    assert got["total_chars"] == want.total_chars
    assert 0 < n_out <= got["rows_in"]


def test_observed_metrics_cost_no_extra_job(spark, sf_dir):
    """The whole point: metrics must not add a job beyond the action that
    computes the frame."""
    sc = spark.sparkContext
    d = load_table(spark, sf_dir, "orders")
    dd, obs = observed(
        d, "orders_obs", F.count(F.lit(1)).alias("n"),
        F.max("o_totalprice").alias("mx"),
    )
    sc.setJobGroup("observe-cost", "metrics ride the action")
    try:
        dd.write.mode("overwrite").format("noop").save()
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("observe-cost")
    assert len(jobs) == 1, jobs
    assert obs.get["n"] > 0 and obs.get["mx"] > 0


def test_stream_metrics_surface_on_progress(spark, sf_dir, tmp_path):
    """Streaming twin: observed metrics appear on the query's progress
    events with values matching the replayed batch."""
    from final_project_big_data_spark.io import load_table
    from final_project_big_data_spark.streaming import pipeline as P

    events = load_table(spark, sf_dir, "events")
    replay = P.replay_dir(spark, sf_dir, str(tmp_path / "replay"), n_batches=4)
    stream = P.with_stream_metrics(
        P.score_events(P.file_stream(spark, replay))
    )
    q = P.run_to_memory(stream, "metrics_out")
    got = [
        p.observedMetrics["stream_metrics"]
        for p in (q.recentProgress or [])
        if p.observedMetrics and "stream_metrics" in p.observedMetrics
    ]
    assert got, "no observedMetrics on any progress event"
    assert sum(m.batch_rows for m in got) == events.count()
    lo = min(m.min_value for m in got if m.min_value is not None)
    hi = max(m.max_value for m in got if m.max_value is not None)
    want = events.agg(F.min("value"), F.max("value")).collect()[0]
    assert (lo, hi) == tuple(want)
