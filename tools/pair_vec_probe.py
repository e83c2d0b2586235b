#!/usr/bin/env python
"""A/B the within-block pair-cosine kernels (round 8).

Times d06/d10/s04 end-to-end (noop sink, min-of-N) under both kernels —
"join" (equi-join + interpreted dot_fold, the pre-round-8 shape) and
"np" (operators/vector.block_pair_cosine, Arrow-batched NumPy dim-fold)
— on one fixture dir. The kernels are bit-identical by construction
(tests/test_similarity.py pins it); this probe measures the constant.

Usage: python tools/pair_vec_probe.py [sf_dir] [runs] [--kernels=np,join]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["d06_embedding_near_dup", "d10_semdedup", "s04_knn_self_join"]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.1"
    runs = int(args[1]) if len(args) > 1 else 3
    kernels = ("join", "np")
    for a in sys.argv[1:]:
        if a.startswith("--kernels="):
            kernels = tuple(a.split("=", 1)[1].split(","))

    # high-volume probe hygiene (the round-7 sweep lessons): spill to
    # DISK, not tmpfs (untimed correctness of the spill path costs
    # nothing; tmpfs pages are RAM), and size the heap to the input —
    # both must precede the JVM launch
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/tmp/spark_probe_local")
    from final_project_big_data_spark.queries import all_specs
    from final_project_big_data_spark.session import (
        get_spark,
        sized_driver_memory,
        sized_max_partition_bytes,
        sized_shuffle_partitions,
    )

    specs = all_specs()
    spark = get_spark(
        app_name="pair_vec_probe",
        shuffle_partitions=sized_shuffle_partitions(sf),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(
                sized_max_partition_bytes(sf)
            ),
            "spark.driver.memory": sized_driver_memory(sf),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict = {"probe": "pair_vec", "sf_dir": sf, "kernels": {}}
    for kern in kernels:
        os.environ["SPARK_GRAFT_PAIR_KERNEL"] = kern
        row = {}
        for name in QUERIES:
            best = None
            for _ in range(runs):
                t0 = time.time()
                specs[name].builder(spark, sf).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            row[name] = round(best, 3)
        out["kernels"][kern] = row
    os.environ.pop("SPARK_GRAFT_PAIR_KERNEL", None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
