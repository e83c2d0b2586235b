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
