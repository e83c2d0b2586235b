"""Differential tests: every registered QuerySpec vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from final_project_big_data_spark.queries import all_specs
from tests.oracle import compare

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_match(name, spark, sf_dir, duck):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    assert df is not None
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
        return
    report = compare(df, duck, spec.oracle)
    assert report["ok"], f"{name}: {report}"
