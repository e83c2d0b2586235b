#!/usr/bin/env python
"""Persisted-index serving-path scale probe (round 11, VERDICT r10 #5).

tests/test_round11_ops.py pins THAT the s06/s07 query plans carry a
runtime dynamicpruningexpression on the index partition column. This
probe records what the pruning BUYS at the 100× fixture (200k vectors):
the same served query min-of-N with dynamic partition pruning ON vs
FORCED OFF (``spark.sql.optimizer.dynamicPartitionPruning.enabled`` —
the only difference between "read nprobe lists" and "read the whole
index"), plus the partition-directory arithmetic (lists probed vs lists
total).

Usage:  python tools/index_serving_probe.py [probe_dir] [runs]
Prints one JSON line per index family.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 200
N_QUERIES_FEW = 5  # the low-latency serving shape: pruning only shows when
# the probed lists are a small fraction of the index (200 probes x nprobe
# cover nearly every list; 5 probes touch <=nprobe*5 of them)


def _timed_min(fn, n):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    from final_project_big_data_spark.operators.ivf_index import (
        ivf_topk_with_index,
        lsh_topk_with_index,
        save_ivf_index,
        save_lsh_index,
    )
    from final_project_big_data_spark.session import get_spark

    if len(sys.argv) > 1:
        sf = sys.argv[1]
    else:
        from tools.scale_probe import materialize

        sf = materialize(100)
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark(app_name="index_serving_probe")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for family, save, query, subdir in (
            ("lsh", save_lsh_index, lsh_topk_with_index, "tables"),
            ("ivf", save_ivf_index, ivf_topk_with_index, "postings"),
        ):
            path = f"/tmp/idx_serve_{family}"
            if not os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
                save(spark, sf, path)
            part_dir = os.path.join(path, subdir)
            lists_total = sum(
                1 for d in os.listdir(part_dir) if "=" in d
            )

            def run():
                query(spark, path, N_QUERIES).write.mode("overwrite").format(
                    "noop"
                ).save()

            out = {
                "index": family,
                "sf_dir": sf,
                "runs": runs,
                "lists_total": lists_total,
            }
            def run_few():
                query(spark, path, N_QUERIES_FEW).write.mode(
                    "overwrite"
                ).format("noop").save()

            def fs_bytes_read():
                # actual bytes read from the local FS by the JVM — the
                # direct measure of what pruning skips (executor page
                # cache makes WALL flat when every list file is tiny)
                total = 0
                stats = spark._jvm.org.apache.hadoop.fs.FileSystem.getAllStatistics()
                for i in range(stats.size()):
                    total += stats.get(i).getBytesRead()
                return total

            dpp = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
            for mode, flag in (("pruned", "true"), ("full_scan", "false")):
                spark.conf.set(dpp, flag)
                plan = spark._jvm.PythonSQLUtils.explainString(
                    query(spark, path, N_QUERIES)._jdf.queryExecution(),
                    "formatted",
                )
                out[f"{mode}_has_dpp"] = "dynamicpruningexpression" in plan
                out[f"{mode}_sec"] = _timed_min(run, runs)
                b0 = fs_bytes_read()
                out[f"{mode}_few_sec"] = _timed_min(run_few, runs)
                out[f"{mode}_few_bytes_read_mb"] = round(
                    (fs_bytes_read() - b0) / 1048576 / runs, 1
                )
            spark.conf.set(dpp, "true")
            out["pruning_speedup"] = round(
                out["full_scan_sec"] / out["pruned_sec"], 3
            )
            out["pruning_speedup_few"] = round(
                out["full_scan_few_sec"] / out["pruned_few_sec"], 3
            )
            out["bytes_pruned_factor_few"] = round(
                out["full_scan_few_bytes_read_mb"]
                / max(out["pruned_few_bytes_read_mb"], 0.1),
                2,
            )
            print(json.dumps(out), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
