"""Round-11 pins: persisted-index serving-path partition pruning
(VERDICT r10 #5) — the s06/s07 postings/tables scans must plan a
runtime dynamicpruningexpression on their partition column, i.e. Spark
reads only the probed inverted lists / hash buckets, not the whole
index. At 100 TB this is the difference between an ANN query touching
nprobe directories and rescanning the corpus-sized index."""

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


def test_s06_tables_scan_partition_pruned(spark, sf_dir):
    df = all_specs()["s06_persisted_lsh_topk"].builder(spark, sf_dir)
    plan = _formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "dynamicpruningexpression(bucket" in plan, plan[:2000]
