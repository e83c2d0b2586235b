"""Driver contract for the spark-graft builder (PySpark target).

Re-exports the engine's query registry
(``final_project_big_data_spark.queries``): every registered QuerySpec
becomes a ``queries()`` entry, and its DuckDB oracle SQL (where
SQL-expressible) becomes the matching ``oracle_sql()`` entry.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

from final_project_big_data_spark.queries import all_specs  # noqa: E402


def _driver_history(specs=None) -> dict[str, tuple[str, int]]:
    """Fold every recorded CORRECTNESS_r*.json into
    {name: ('green'|'failed', round_of_last_recorded_row)}.

    Names absent from every round's file were never reached by the
    verification driver (it checks a capped subset per round).

    Chronological LAST result wins (rounds sort lexically): a later green
    clears an old failure, and a later failure re-queues an entry that was
    once green — any-green-ever-wins would park a regression at the back
    of the capped rotation forever. The round number of that last row is
    retained so the rotation can re-surface the STALEST greens first
    (driver-visible evidence ages even when the code still passes).

    A ``no_oracle`` rows-only pass only counts as green while the spec
    still has no oracle: entries that have since GAINED an oracle (e.g.
    mm02/mm03 in round 2) are treated as never-verified so the rotation
    re-surfaces them for a real hash-checked row instead of letting a weak
    historical pass park them at the back of the queue.
    """
    hist: dict[str, tuple[str, int]] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if row.get("err") == "no_oracle":
                ok = row.get("spark_rows") is not None
                spec = (specs or {}).get(name)
                if ok and spec is not None and spec.oracle is not None:
                    # weak PASS, spec now oracle-able → treat as unverified
                    # so the rotation re-surfaces it for a hash-checked row.
                    # A crashed rows-only row (spark_rows None) stays
                    # 'failed' — a recorded failure must keep front-of-queue
                    # rank, not demote to the never-verified class.
                    continue
            else:
                ok = all(
                    row.get(k) is True
                    for k in ("rows_match", "schema_match", "hash_match")
                )
            hist[name] = ("green" if ok else "failed", rnd)
    return hist


def _driver_status(specs=None) -> dict[str, str]:
    """{name: 'green'|'failed'} view of :func:`_driver_history`."""
    return {n: st for n, (st, _) in _driver_history(specs).items()}


def _contract_rank(name: str) -> int:
    """Tie-break within the never-driver-checked class: SURVEY §2.4
    contract components outrank extension queries, so the driver's capped
    prefix burns its slots on the graded inventory first.

    0 = Tier-A core (q01–q40, incl. split ids like q28a) ·
    1 = Tier-B contract surfaces (u01–u04, w01–w04, s01–s03) ·
    2 = q-extension (q41+) · 3 = everything else.
    """
    m = re.match(r"q(\d+)", name)
    if m:
        return 0 if int(m.group(1)) <= 40 else 2
    if re.match(r"(u0[1-4]|w0[1-4]|s0[1-3])_", name):
        return 1
    return 3


def _ordered_specs():
    """Registry in driver-priority order: previously-FAILED entries first
    (fixes need fresh rows), then NEVER-driver-checked ones (contract
    components before extensions, see ``_contract_rank``), then green —
    with greens ordered by LAST-VERIFIED ROUND ascending (stalest first).

    The driver verifies a capped prefix of ``queries()`` per round; this
    ordering self-rotates as each round's CORRECTNESS file lands. With all
    entries green, the age ordering means each ~50-cap round re-validates
    the 50 stalest greens, so no entry's driver-visible evidence is ever
    more than ~ceil(N/cap) rounds old — a green from three rounds ago
    proves nothing about code that changed since. Stable within equal age
    (registration order).
    """
    specs = all_specs()
    hist = _driver_history(specs)
    reg_index = {n: i for i, n in enumerate(specs)}

    def key(n):
        st, rnd = hist.get(n, (None, -1))
        if st == "failed":
            return (0, 0, 0, reg_index[n])
        if st is None:
            return (1, _contract_rank(n), 0, reg_index[n])
        return (2, 0, rnd, reg_index[n])

    return {n: specs[n] for n in sorted(specs, key=key)}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-shape hash aggregate over lineitem (SURVEY.md §7.1's minimum
    end-to-end slice).
    """
    specs = all_specs()
    return specs["q15_hash_aggregate"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Emitted in driver-priority order (see ``_ordered_specs``) so the
    driver's capped per-round check reaches unverified entries first.
    """
    return {name: spec.builder for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in _ordered_specs().items()
        if spec.oracle is not None
    }
