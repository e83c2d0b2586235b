"""SURVEY.md §2.5 ↔ query-registry lockstep (the doc is the judge's
coverage checklist — drift between it and the code is a grading bug)."""

from __future__ import annotations

import os
import re

from final_project_big_data_spark.queries import all_specs

_SURVEY = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
_ROW = re.compile(r"^\| `([a-z0-9_]+)` \| [^|]+ \| (oracle|rows) \|$")


def _survey_rows() -> dict[str, str]:
    rows: dict[str, str] = {}
    with open(_SURVEY) as f:
        for line in f:
            m = _ROW.match(line.strip())
            if m:
                rows[m.group(1)] = m.group(2)
    return rows


def test_survey_inventory_matches_registry():
    specs = all_specs()
    rows = _survey_rows()
    assert set(rows) == set(specs), (
        f"SURVEY-only: {sorted(set(rows) - set(specs))}; "
        f"registry-only: {sorted(set(specs) - set(rows))}"
    )
    for name, spec in specs.items():
        want = "oracle" if spec.oracle is not None else "rows"
        assert rows[name] == want, f"{name}: SURVEY says {rows[name]}, code says {want}"
