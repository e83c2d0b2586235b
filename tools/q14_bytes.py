#!/usr/bin/env python
"""q14 shape A/B with MEASURED shuffle bytes (VERDICT r6 ask #2).

The round-6 q14 study adopted the eager pre-agg shape on the argument
"pre-agg moves ~4× fewer fact bytes on a network-shuffle cluster" while
losing ~11% wall locally at 100×. This tool replaces the argument with a
measurement: it runs BOTH shapes in one fresh process each invocation
(one shape per invocation — fresh-process rule) with the UI REST API on,
and reports per-stage shuffle-bytes-written/read plus wall time.

Usage::

    python tools/q14_bytes.py preagg|joinagg [sf_dir] [runs]

Shapes:
- ``preagg``  — the shipping registry builder (queries/relational.py q14):
  lineitem filtered → groupBy(l_orderkey).sum → join orders → join
  customer → top-k.
- ``joinagg`` — the classic TPC-H Q3 plan: filtered lineitem joins
  orders+customer first, then groupBy(l_orderkey, o_orderdate) → top-k.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from final_project_big_data_spark.io import load_table  # noqa: E402


def build(shape: str, spark, sf: str):
    c = load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date")
    )
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-01-01").cast("date")
    )
    if shape == "preagg":
        import os

        from final_project_big_data_spark.queries import all_specs

        # round 11: the registry default flipped to join-first; the env
        # knob selects the byte-saving pre-agg variant this tool measures
        os.environ["SPARK_GRAFT_Q14_PREAGG"] = "1"
        return all_specs()["q14_multiway_join"].builder(spark, sf)
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).join(
        c, F.col("c_custkey") == F.col("o_custkey")
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(20)
    )


def main() -> None:
    shape = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale_probe_x10"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from final_project_big_data_spark.session import (
        get_spark,
        sized_adaptive_enabled,
        sized_driver_memory,
        sized_max_partition_bytes,
        sized_shuffle_partitions,
    )

    spark = get_spark(
        app_name="q14_bytes",
        shuffle_partitions=sized_shuffle_partitions(sf),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(
                sized_max_partition_bytes(sf)
            ),
            "spark.sql.adaptive.enabled": str(
                sized_adaptive_enabled(sf)
            ).lower(),
            "spark.driver.memory": sized_driver_memory(sf),
            "spark.ui.enabled": "true",
            # round 12 (VERDICT r11 #1): shuffle-medium/codec matrix —
            # SPARK_LOCAL_DIRS picks tmpfs vs real disk (env overrides any
            # spark.local.dir conf), this knob turns the wire-like codec on
            **(
                {
                    "spark.shuffle.compress": "true",
                    "spark.shuffle.spill.compress": "true",
                }
                if os.environ.get("SPARK_GRAFT_SHUFFLE_COMPRESS") == "1"
                else {}
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def stages():
        url = f"{base}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.load(r)

    best, window = float("inf"), (0, 0)
    for _ in range(runs):
        floor = max((s["stageId"] for s in stages()), default=-1) + 1
        df = build(shape, spark, sf)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        if dt < best:
            best = dt
            window = (floor, max((s["stageId"] for s in stages()), default=-1))

    rows = [
        s
        for s in sorted(stages(), key=lambda s: s["stageId"])
        if window[0] <= s["stageId"] <= window[1]
    ]
    per_stage = []
    w_total = r_total = 0
    for s in rows:
        w, rd = s.get("shuffleWriteBytes") or 0, s.get("shuffleReadBytes") or 0
        per_stage.append(
            {
                "stage": s["stageId"],
                "tasks": s.get("numCompleteTasks"),
                "input_mb": round((s.get("inputBytes") or 0) / 1048576, 1),
                "sh_write_mb": round(w / 1048576, 2),
                "sh_read_mb": round(rd / 1048576, 2),
                "exec_run_s": round((s.get("executorRunTime") or 0) / 1e3, 2),
            }
        )
        w_total += w
        r_total += rd
    print(
        json.dumps(
            {
                "shape": shape,
                "sf_dir": sf,
                "runs": runs,
                "best_wall_s": round(best, 3),
                "shuffle_write_mb_total": round(w_total / 1048576, 2),
                "shuffle_read_mb_total": round(r_total / 1048576, 2),
                "stages": per_stage,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
