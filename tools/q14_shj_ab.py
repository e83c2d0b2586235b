#!/usr/bin/env python
"""A/B: q14's fact join at volume as SortMergeJoin (default) vs AQE's
runtime SMJ->ShuffledHashJoin rewrite (guide §3.1).

The 1000x plan sorts the ~107M-row filtered fact and the ~3M-row dim
join output on l_orderkey for the SMJ; a shuffled-hash join builds a
per-partition hash table over the dim side instead and skips BOTH
sorts. The rewrite knob (spark.sql.adaptive.maxShuffledHashJoinLocalMap
Threshold) is runtime-gated on the actual post-shuffle partition size,
so it cannot OOM a partition bigger than the threshold — the reason to
prefer it over a static SHUFFLE_HASH hint at 100 TB.

The ``shj`` arm sets ONLY the AQE threshold (ADVICE r12: an earlier
version also flipped spark.sql.join.preferSortMergeJoin, which lets the
planner pick a STATIC shuffled-hash join at plan time — a different,
not-size-gated mechanism than the one this tool documents). Note the
engine's local session already sets preferSortMergeJoin=false for local
masters (session.py), so both arms inherit that; the arms differ only
in whether the AQE runtime rewrite may fire.

Usage: python tools/q14_shj_ab.py smj|shj [runs] [sf_dir]
One config per process (round-6 lesson).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_scale_probe_x1000"

    from final_project_big_data_spark.queries import all_specs
    from final_project_big_data_spark.session import (
        get_spark,
        sized_adaptive_enabled,
        sized_max_partition_bytes,
        sized_shuffle_partitions,
    )

    extra = {
        "spark.sql.files.maxPartitionBytes": str(
            sized_max_partition_bytes(sf_dir)
        ),
        "spark.sql.adaptive.enabled": str(sized_adaptive_enabled(sf_dir)).lower(),
    }
    if mode == "shj":
        extra["spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"] = "419430400"
    spark = get_spark(
        app_name=f"q14_{mode}",
        shuffle_partitions=sized_shuffle_partitions(sf_dir),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    spec = all_specs()["q14_multiway_join"]
    samples = []
    for i in range(runs + 1):
        df = spec.builder(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        if i:
            samples.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({"mode": mode, "min": min(samples), "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
