"""The high-volume sweep's deterministic sampled-hash mode (VERDICT r6 #4).

The --max-rows guard used to leave big-result entries count-checked
only at 1000x; ``sweep_registry.sample_predicates`` now value-diffs a
bounded deterministic sample instead. Its one load-bearing assumption:
both engines select EXACTLY the same rows, which requires the stable
types (int/bigint/string/date/boolean) to render to identical strings
under CAST and identical NULL handling under concat_ws. These tests pin
that assumption against live engines.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.sweep_registry import sample_predicates


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_same_rows_selected_on_both_engines(spark, con, tmp_path):
    """Every stable type at once, with NULLs in each column: the md5
    filter must pick the identical key set on Spark and DuckDB. The
    hand-off is a parquet file, the same transport the sweep's tables
    use (a pandas hand-off would mangle boolean-with-NULL to Python
    'True' repr — a harness artifact, not an engine property)."""
    rows = [
        (i,
         None if i % 7 == 0 else i * 31,
         None if i % 5 == 0 else f"s{i}",
         None if i % 3 == 0 else f"2026-01-{1 + i % 28:02d}",
         None if i % 11 == 0 else i % 2 == 0)
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "k int, b bigint, s string, d string, f boolean"
    ).withColumn("d", F.col("d").cast("date"))
    preds = sample_predicates(df, 0.3)
    assert preds is not None
    spark_pred, duck_pred, cols = preds
    assert cols == ["k", "b", "s", "d", "f"]
    picked_spark = sorted(
        r.k for r in df.filter(spark_pred).select("k").collect()
    )
    pq = str(tmp_path / "t.parquet")
    df.write.parquet(pq)
    picked_duck = sorted(
        r[0]
        for r in con.execute(
            f"SELECT \"k\" FROM '{pq}/*.parquet' WHERE {duck_pred}"
        ).fetchall()
    )
    assert picked_spark == picked_duck
    # the fraction is approximate but must not be degenerate
    assert 0 < len(picked_spark) < 500


def test_unstable_only_schema_returns_none(spark):
    df = spark.createDataFrame([(1.5, [1.0])], "x double, v array<double>")
    assert sample_predicates(df, 0.5) is None


def test_unstable_columns_excluded_from_hash(spark):
    """Doubles/arrays ride along unhashed: the predicate must depend
    only on the stable columns, so two rows equal on stable columns
    are co-selected regardless of float payload."""
    df = spark.createDataFrame(
        [(1, 0.1, "a"), (1, 0.30000000000000004, "a"), (2, 0.2, "b")],
        "k int, x double, s string",
    )
    spark_pred, _, cols = sample_predicates(df, 0.5)
    assert cols == ["k", "s"]
    picked = [tuple(r) for r in df.filter(spark_pred).select("k").collect()]
    assert picked.count((1,)) in (0, 2)
