#!/usr/bin/env python
"""Volume A/B for the global-index/prefix-sum operator family.

Round 12 replaced the sampled range-exchange + persist implementation
(operators/indexing.py, r11 shape) with a deterministic equi-depth
histogram (min/max pass + cell histogram + broadcast map). At sf0.1 the
new shape pays ~+0.15 s of extra fixed jobs/scans (measured via
tools/ab_query.py); this probe measures the shapes where it must win:
high volume, where the old design paid a full-data RANGE EXCHANGE plus a
MEMORY_AND_DISK persist of the whole frame before the window exchange.

Synthetic input (no disk dependency — the operator cost dominates):
N rows of (k long ~ uniform hash, n_chars long with ties, v small long),
32 input partitions. Three shapes, min of R runs each, noop sink:

- gidx_unique:  with_global_index on a unique key (t11/x03 shape)
- gidx_ties:    with_global_index on a tied key + tiebreak (q26 shape)
- psum:         with_prefix_sum over the tied key ordering

Usage: python tools/idx_volume_ab.py [N] [R]   (default 100_000_000, 3)
Prints one JSON line. Run once on the working tree and once on the r11
tree (git stash) for the A/B; SCALE.md round 12 records both.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
R = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from final_project_big_data_spark.operators.indexing import (
        with_global_index,
        with_prefix_sum,
    )
    from final_project_big_data_spark.session import get_spark

    spark = get_spark(
        app_name="idx_volume_ab",
        shuffle_partitions=128,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
            "spark.shuffle.compress": "true",
            "spark.shuffle.spill.compress": "true",
        },
    )

    def base():
        return spark.range(0, N, 1, 32).select(
            F.col("id").alias("k"),
            F.pmod(F.hash("id"), F.lit(20000)).cast("long").alias("n_chars"),
            (F.pmod(F.hash("id", "id"), F.lit(512)) + 1).cast("long").alias("v"),
        )

    shapes = {
        "gidx_unique": lambda: with_global_index(base(), ["k"]),
        "gidx_ties": lambda: with_global_index(
            base(), [F.desc("n_chars"), F.asc("k")]
        ),
        "psum": lambda: with_prefix_sum(base(), ["n_chars", "k"], "v"),
    }
    out: dict[str, float] = {}
    for name, fn in shapes.items():
        best = float("inf")
        for _ in range(R):
            df = fn()
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 2)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    info = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    print(
        json.dumps(
            {
                "n": N,
                "runs": R,
                "timings_sec": out,
                "persisted_rdds_after": len(info),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
