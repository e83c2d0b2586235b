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
