"""Python Data Source API connector tests (sources/pydatasource.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from final_project_big_data_spark.sources.pydatasource import (
    doc_text,
    register_sources,
)


@pytest.fixture()
def docs(spark):
    register_sources(spark)
    return (
        spark.read.format("synthdocs")
        .option("n", 200)
        .option("partitions", 8)
        .load()
    )


def test_reader_plans_declared_partitions(docs):
    """partitions() drives task planning: the scan parallelizes 8-way."""
    assert docs.rdd.getNumPartitions() == 8


def test_reader_rows_match_closed_form(docs):
    rows = {r.doc_id: (r.shard, r.text) for r in docs.collect()}
    assert len(rows) == 200
    for i in (0, 7, 63, 199):
        assert rows[i] == (i % 4, doc_text(i))


def test_register_is_idempotent(spark, docs):
    register_sources(spark)  # second registration must not raise
    assert spark.read.format("synthdocs").option("n", 3).load().count() == 3


def test_writer_commit_protocol(spark, docs, tmp_path):
    """write() runs per-partition and commit() publishes ONE atomic summary
    aggregating every task's WriterCommitMessage."""
    out = str(tmp_path / "summary.json")
    docs.write.format("rowcount_sink").option("path", out).mode("append").save()
    with open(out) as f:
        summary = json.load(f)
    assert summary["total_rows"] == 200
    assert summary["partitions"] == 8


def test_source_feeds_engine_operators(spark, docs):
    """The connector output flows into ordinary JVM-side operators."""
    agg = (
        docs.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("shard")
        .collect()
    )
    assert [(r.shard, r.n) for r in agg] == [(i, 50) for i in range(4)]


def test_streaming_reader_delivers_all_rows(spark):
    """The connector's streaming half: offset-paged micro-batches drain
    the full row range exactly once. availableNow would snapshot only the
    first prefetched page of a simple stream reader, so this drives a
    continuous trigger and polls until the cap is reached."""
    import time

    register_sources(spark)
    stream = (
        spark.readStream.format("synthdocs")
        .option("n", 120)
        .option("rowsPerBatch", 40)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synthdocs_stream")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while (
            time.time() < deadline
            and spark.table("synthdocs_stream").count() < 120
        ):
            time.sleep(0.5)
    finally:
        q.stop()
    got = {r.doc_id: r.text for r in spark.table("synthdocs_stream").collect()}
    assert len(got) == 120  # every row exactly once, no dup, no loss
    assert got[77] == doc_text(77)
