"""Driver-contract registry ordering (__spark_entry__._ordered_specs).

The verification driver checks a capped prefix of ``queries()`` per
round; the ordering (failed → never-checked → green, folded over every
CORRECTNESS_r*.json) is what guarantees each entry eventually gets a
driver-verified row. This pins that logic against fabricated round files.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as E  # noqa: E402

_GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
_FAILED = {"rows_match": True, "schema_match": True, "hash_match": False,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
_ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None,
              "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"}


@pytest.fixture()
def fake_rounds(tmp_path, monkeypatch):
    monkeypatch.setattr(E, "_HERE", str(tmp_path))

    def write(round_no: int, rows: dict) -> None:
        with open(tmp_path / f"CORRECTNESS_r{round_no:02d}.json", "w") as f:
            json.dump(rows, f)

    return write


def test_failed_first_then_unchecked_then_green(fake_rounds):
    fake_rounds(1, {"q02_filter_compare": _GREEN, "q01_scan_project": _FAILED,
                    "m01_rf_prepare_train_score": _ROWS_ONLY})
    names = list(E.queries())
    assert names[0] == "q01_scan_project"  # failed → front of the queue
    # the checked-green row sorts behind every never-checked entry
    assert names[-1] == "q02_filter_compare"
    # m01's historical rows-only pass no longer counts: its spec now has a
    # real oracle, so it re-enters the never-verified class (NOT the back)
    assert names.index("m01_rf_prepare_train_score") < len(names) - 1


def test_later_green_overrides_earlier_failure(fake_rounds):
    fake_rounds(1, {"q01_scan_project": _FAILED})
    fake_rounds(2, {"q01_scan_project": _GREEN})
    assert E._driver_status()["q01_scan_project"] == "green"
    assert list(E.queries())[-1] == "q01_scan_project"


def test_later_failure_overrides_earlier_green(fake_rounds):
    """Chronological last-result-wins: a regression recorded AFTER a green
    must re-queue the entry at the front — any-green-ever-wins would park
    it behind the capped rotation forever."""
    fake_rounds(1, {"q01_scan_project": _GREEN})
    fake_rounds(2, {"q01_scan_project": _FAILED})
    assert E._driver_status()["q01_scan_project"] == "failed"
    assert list(E.queries())[0] == "q01_scan_project"


def test_no_oracle_green_reclassified_when_spec_gains_oracle(fake_rounds):
    """A historical rows-only pass must stop counting as green once the
    spec has a real oracle (mm02/mm03's round-2 situation): the entry
    re-enters the never-verified class so the driver re-reaches it."""
    from final_project_big_data_spark.queries import all_specs

    specs = all_specs()
    name = next(n for n, s in specs.items() if s.oracle is not None)
    fake_rounds(1, {name: _ROWS_ONLY})
    assert name not in E._driver_status(specs)
    # without spec context the historical fold is unchanged (back-compat)
    assert E._driver_status()[name] == "green"


def test_no_oracle_crash_stays_failed_when_spec_gains_oracle(fake_rounds):
    """A rows-only row whose builder CRASHED (spark_rows None) must keep
    front-of-queue 'failed' rank even after the spec gains an oracle —
    only weak PASSES get demoted to the never-verified class (ADVICE r3:
    a recorded failure must never rank behind never-checked entries)."""
    from final_project_big_data_spark.queries import all_specs

    specs = all_specs()
    name = next(n for n, s in specs.items() if s.oracle is not None)
    crashed = dict(_ROWS_ONLY, spark_rows=None)
    fake_rounds(1, {name: crashed})
    assert E._driver_status(specs)[name] == "failed"


def test_green_class_orders_by_verification_age(fake_rounds):
    """Greens re-surface STALEST FIRST: an entry last verified in r1 must
    precede one last verified in r2 regardless of registration order, so
    the driver's ~50-cap prefix continuously refreshes the oldest
    driver-visible evidence (VERDICT r4 item 1)."""
    # q02 registers before q01-alphabetical? use real registry names; make
    # the LATER-registered entry the STALER one to prove age beats
    # registration order
    fake_rounds(1, {"q02_filter_compare": _GREEN})
    fake_rounds(2, {"q01_scan_project": _GREEN})
    names = list(E.queries())
    assert names[-1] == "q01_scan_project"      # freshest green → very back
    assert names[-2] == "q02_filter_compare"    # stalest green → ahead of it


def test_green_refreshed_in_later_round_moves_back(fake_rounds):
    """A green re-verified in a later round carries the LATER round as its
    age (last row wins), so it rotates to the back again."""
    fake_rounds(1, {"q01_scan_project": _GREEN, "q02_filter_compare": _GREEN})
    fake_rounds(3, {"q01_scan_project": _GREEN})
    names = list(E.queries())
    assert names[-1] == "q01_scan_project"
    assert names[-2] == "q02_filter_compare"


def test_no_round_files_sorts_by_contract_rank_then_registration(fake_rounds):
    from final_project_big_data_spark.queries import all_specs

    specs = list(all_specs())
    reg = {n: i for i, n in enumerate(specs)}
    expect = sorted(specs, key=lambda n: (E._contract_rank(n), reg[n]))
    assert list(E.queries()) == expect


def test_oracle_sql_subset_and_alignment():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    # rows-only entries are exactly the ones without oracle SQL
    from final_project_big_data_spark.queries import all_specs

    assert {n for n, s in all_specs().items() if s.oracle is None} == (
        set(qs) - set(osql)
    )


def test_contract_core_outranks_extensions_within_unchecked(fake_rounds):
    """With one green row recorded, the never-checked class must surface
    SURVEY §2.4 contract components (q01–q40, u/w/s contract ids) before
    extension queries — the driver's ~50-entry cap has to land on the
    graded inventory first."""
    fake_rounds(1, {"q01_scan_project": _GREEN})
    names = list(E.queries())
    # every Tier-A core + contract-surface entry precedes every extension
    core = [n for n in names if E._contract_rank(n) in (0, 1)
            and n != "q01_scan_project"]
    ext = [n for n in names if E._contract_rank(n) in (2, 3)]
    assert max(names.index(n) for n in core) < min(names.index(n) for n in ext)
    assert names[-1] == "q01_scan_project"  # green sorts behind everything


def test_contract_rank_classes():
    assert E._contract_rank("q28a_union_all") == 0
    assert E._contract_rank("q40_json_roundtrip") == 0
    assert E._contract_rank("q41_stats_agg") == 2
    assert E._contract_rank("u03_grouped_udaf") == 1
    assert E._contract_rank("w04_time_rollup") == 1
    assert E._contract_rank("s03_ivf_ann_topk") == 1
    assert E._contract_rank("s04_knn_self_join") == 3
    assert E._contract_rank("d03_minhash_lsh_pairs") == 3
