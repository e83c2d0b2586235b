#!/usr/bin/env python
"""Skew-join probe: AQE OptimizeSkewedJoin vs manual salting (round 10,
VERDICT r9 #4).

``q72`` salts by hand because its dim is sketch-sized (below AQE's
radar AND broadcastable, so there is no shuffle join to optimize). The
open engine question was: for the join AQE CAN see — fact ⋈ mid-size
dim, sort-merge, one genuinely hot key — does the engine recommend
``spark.sql.adaptive.skewJoin`` or the salted rewrite at 100 TB?

This probe builds a deterministic zipf-ish fact (hot key = ~35% of all
rows, md5-assigned) at N× the sf events volume, joins it to a
dim sized ABOVE the broadcast threshold, and measures three variants:

  plain     AQE on, skewJoin OFF      — the straggler baseline
  aqe_skew  AQE on, skewJoin ON       — asserts OptimizeSkewedJoin fired
            (``skew=true`` in the executed SortMergeJoin node)
  salted    plans.skew.salted_join    — the portable rewrite

All three must agree on the checksum aggregate. Usage:

    python tools/skew_probe.py [mult] [n_dim_keys]

Prints one JSON line per variant:
  {"variant": ..., "wall_sec": ..., "rows": ..., "skew_in_plan": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 100
N_KEYS = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
HOT_SHARE = 3  # keys 0..2 of the md5 % 10 space stay hot → ~30% on key 0
OUT = f"/tmp/spark_graft_skew_probe_x{MULT}"


def build_tables(spark):
    from pyspark.sql import functions as F

    from final_project_big_data_spark.io import load_table

    fact_path = os.path.join(OUT, "fact")
    dim_path = os.path.join(OUT, "dim")
    if not os.path.isdir(fact_path):
        base = load_table(spark, SRC, "events").select("event_id", "value")
        copies = F.explode(F.array(*[F.lit(i) for i in range(MULT)]))
        rid = F.col("event_id") + F.col("c") * F.lit(10_000_000)
        # deterministic hot-key assignment: ~30% of rows hash to bucket 0
        # → key 0; the rest spread uniformly over N_KEYS
        h = F.conv(F.substring(F.md5(rid.cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        key = F.when(h % 10 < HOT_SHARE, F.lit(0)).otherwise(h % N_KEYS)
        (
            base.withColumn("c", copies)
            .select(rid.alias("row_id"), key.alias("k"), "value")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(fact_path)
        )
        (
            spark.range(N_KEYS)
            .select(
                F.col("id").alias("k"),
                F.md5(F.col("id").cast("string")).alias("dim_payload"),
                (F.col("id") % 100).alias("dim_group"),
            )
            .repartition(4)
            .write.mode("overwrite")
            .parquet(dim_path)
        )
    return fact_path, dim_path


def run_variant(spark, name, fact_path, dim_path, conf, salted):
    from pyspark.sql import functions as F

    from final_project_big_data_spark.plans.skew import salted_join

    for k, v in conf.items():
        spark.conf.set(k, v)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)
    j = (
        salted_join(fact, dim, "k", n_salts=16)
        if salted
        else fact.join(dim, "k")
    )
    agg = j.groupBy("dim_group").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
    )
    t0 = time.perf_counter()
    rows = agg.collect()
    wall = time.perf_counter() - t0
    plan = agg._jdf.queryExecution().executedPlan().toString()
    checksum = (len(rows), sum(r["n"] for r in rows))
    print(
        json.dumps(
            {
                "variant": name,
                "wall_sec": round(wall, 2),
                "groups": checksum[0],
                "rows_joined": checksum[1],
                "skew_in_plan": "skew=true" in plan,
            }
        ),
        flush=True,
    )
    return checksum


def main():
    from final_project_big_data_spark.session import get_spark

    spark = get_spark(
        app_name="skew_probe",
        extra_conf={
            # dim must NOT broadcast, or there is no shuffle join to skew
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # make detection sensitive enough for a local-scale probe while
            # keeping the 5x-median factor production-shaped
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fact_path, dim_path = build_tables(spark)
    n = spark.read.parquet(fact_path).count()
    print(json.dumps({"fact_rows": n, "dim_rows": N_KEYS}), flush=True)

    checks = []
    for _ in range(2):  # two passes: second is warm-cache, report both
        checks.append(
            run_variant(
                spark,
                "plain",
                fact_path,
                dim_path,
                {"spark.sql.adaptive.skewJoin.enabled": "false"},
                salted=False,
            )
        )
        checks.append(
            run_variant(
                spark,
                "aqe_skew",
                fact_path,
                dim_path,
                {"spark.sql.adaptive.skewJoin.enabled": "true"},
                salted=False,
            )
        )
        checks.append(
            run_variant(
                spark,
                "salted",
                fact_path,
                dim_path,
                {"spark.sql.adaptive.skewJoin.enabled": "true"},
                salted=True,
            )
        )
    assert len(set(checks)) == 1, f"variants disagree: {checks}"
    spark.stop()


if __name__ == "__main__":
    main()
