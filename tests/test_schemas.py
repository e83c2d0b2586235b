"""Schema-contract tests: every fixture loaded through ``load_table``
must match the declared ``TABLE_SCHEMAS`` registry (the engine's
declared-schema discipline — io.py reads the parquet footer, so drift
between the files and the registry must fail loudly here, not in a query).
"""

from __future__ import annotations

import pytest

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.schemas import TABLE_NAMES, TABLE_SCHEMAS


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_loaded_schema_matches_registry(spark, sf_dir, name):
    got = [(f.name, f.dataType) for f in load_table(spark, sf_dir, name).schema]
    want = [(f.name, f.dataType) for f in TABLE_SCHEMAS[name]]
    assert got == want, f"{name}: {got} != {want}"


def test_fixture_drift_tripwire_names_column(spark, sf_dir):
    """Simulated fixture drift must raise one loud error naming the drifted
    column — not N cryptic downstream AnalysisExceptions (the round-2
    failure mode when events.ts moved ns-int64 → µs-timestamp)."""
    from final_project_big_data_spark.io import _check_fixture_schema

    from pyspark.sql import functions as F

    drifted = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("double")
    )
    with pytest.raises(RuntimeError, match=r"fixture drift.*'ts'.*expected timestamp"):
        _check_fixture_schema("events", drifted)


def test_fixture_drift_tripwire_names_missing_column(spark, sf_dir):
    drifted = load_table(spark, sf_dir, "events").drop("props")
    with pytest.raises(RuntimeError, match=r"fixture drift.*missing.*props"):
        _check_fixture_schema_fresh("events", drifted)


def _check_fixture_schema_fresh(name, df):
    from final_project_big_data_spark import io

    io._SCHEMA_OK.clear()
    io._check_fixture_schema(name, df)


def test_fixture_drift_tripwire_names_extra_column(spark, sf_dir):
    from pyspark.sql import functions as F

    drifted = load_table(spark, sf_dir, "events").withColumn(
        "surprise", F.lit(1)
    )
    with pytest.raises(RuntimeError, match=r"fixture drift.*unexpected.*surprise"):
        _check_fixture_schema_fresh("events", drifted)
