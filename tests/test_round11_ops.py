"""Round-11 pins: persisted-index serving-path partition pruning
(VERDICT r10 #5).

The s07 postings scan must plan a runtime dynamicpruningexpression on
centroid_id AND the probe side must be a broadcast build — under
Spark's default ``dynamicPartitionPruning.reuseBroadcastOnly`` a
planned DPP expression over a non-broadcast join silently degenerates
to ``true`` at runtime (found by the round-11 serving probe's FS
bytes-read metric: the factor was exactly 1.0 until the broadcast hint
landed, then 1.46 = the 400/280 probed-list arithmetic). At 100 TB the
pruned scan is the difference between an ANN query touching
|probes|×nprobe directories and rescanning the corpus-sized index.

s06 (LSH) keeps its planned-DPP pin for partition-discovery regression
coverage, but its pruning is STRUCTURALLY nil at 2^n_planes = 16
buckets (multiprobe covers them all) and the broadcast hint was
measured 2.8× slower on the bulk shape — see _lsh_probe's comment."""

from __future__ import annotations

from final_project_big_data_spark.queries import all_specs


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_s07_postings_scan_partition_pruned(spark, sf_dir):
    df = all_specs()["s07_persisted_quantized_ivf"].builder(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "dynamicpruningexpression(cast(centroid_id" in plan or (
        "dynamicpruningexpression(centroid_id" in plan
    ), plan[:2000]
    # the broadcast that makes the DPP real at runtime (reuseBroadcastOnly)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_s06_tables_scan_partition_pruned(spark, sf_dir):
    df = all_specs()["s06_persisted_lsh_topk"].builder(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "dynamicpruningexpression(bucket" in plan, plan[:2000]
