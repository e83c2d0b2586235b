#!/usr/bin/env python
"""Long-session storage probe for the indexing pins (round 12, VERDICT
r11 #5).

Runs N consecutive x03-shaped indexed queries in ONE session and samples
``getRDDStorageInfo`` after each, in two modes:

- ``unscoped``: the lazy registry path — pins are released by the
  ContextCleaner's periodic GC (the engine pins
  ``spark.cleaner.periodicGC.interval``; here shortened to 1min so the
  probe can SEE a tick). Pass criteria: storage grows between ticks,
  COLLAPSES at a tick (at least one drop observed), and the maximum is
  bounded by (queries per tick) × (pin size) — steady-state flat.
- ``scoped``: the same queries wrapped in ``index_pin_scope`` (the
  caller-owns-the-action pattern) — storage returns to ~zero after
  every query.

Prints one JSON line with the per-query block-count series and the
verdict fields SCALE.md quotes.

Usage: python tools/idx_session_probe.py [n_queries] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 60
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def main() -> None:
    from final_project_big_data_spark.operators.indexing import index_pin_scope
    from final_project_big_data_spark.queries import all_specs
    from final_project_big_data_spark.session import get_spark

    spark = get_spark(
        app_name="idx_session_probe",
        shuffle_partitions=16,
        extra_conf={"spark.cleaner.periodicGC.interval": "1min"},
    )
    sc = spark.sparkContext._jsc.sc()
    builder = all_specs()["x03_global_index"].builder

    def storage():
        infos = sc.getRDDStorageInfo()
        return len(infos), sum(i.memSize() + i.diskSize() for i in infos)

    out: dict = {"n_queries": N, "sf": SF}
    for mode in ("unscoped", "scoped"):
        series = []
        t0 = time.time()
        for i in range(N):
            if mode == "scoped":
                with index_pin_scope():
                    builder(spark, SF).write.mode("overwrite").format(
                        "noop"
                    ).save()
            else:
                builder(spark, SF).write.mode("overwrite").format("noop").save()
            n_blocks, nbytes = storage()
            series.append(n_blocks)
        drops = sum(
            1 for a, b in zip(series, series[1:]) if b < a
        )  # GC ticks / scope releases observed
        out[mode] = {
            "series": series,
            "max_rdds": max(series),
            "final_rdds": series[-1],
            "drops_observed": drops,
            "wall_sec": round(time.time() - t0, 1),
        }
        print(f"# {mode}: max={max(series)} final={series[-1]} drops={drops}",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
