"""Global-index / sharding operator invariants (operators/indexing.py)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.operators.indexing import (
    with_global_index,
    with_shard,
)


def test_global_index_matches_single_window(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    got = {
        r.doc_id: r.row_index
        for r in with_global_index(d, ["n_chars", "doc_id"]).collect()
    }
    want = {
        r.doc_id: r.idx
        for r in d.select(
            "doc_id",
            (F.row_number().over(W.orderBy("n_chars", "doc_id")) - 1).alias("idx"),
        ).collect()
    }
    assert got == want


def test_global_index_dense_across_partitions(spark):
    # force many range partitions so prefix offsets actually matter
    df = spark.range(0, 10_000).repartition(16).select(F.col("id").alias("k"))
    idx = sorted(
        r.row_index for r in with_global_index(df, ["k"]).collect()
    )
    assert idx == list(range(10_000))


def test_global_index_descending_order(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    rows = with_global_index(df, [F.desc("k")]).collect()
    assert all(r.row_index == 99 - r.k for r in rows)


def test_shard_assignment_stable_and_balanced(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = with_shard(d, "doc_id", 8).select("doc_id", "shard")
    b = with_shard(d.repartition(13), "doc_id", 8).select("doc_id", "shard")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    per = dict(
        a.groupBy("shard").count().rdd.map(lambda r: (r["shard"], r["count"])).collect()
    )
    n = sum(per.values())
    assert set(per) == set(range(8))
    assert max(per.values()) < 2 * n / 8  # no degenerate shard
