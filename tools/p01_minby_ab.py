#!/usr/bin/env python
"""A/B: p01 fingerprint-dedup as window row_number (shipping) vs
min(struct) hash aggregate.

Both keep the lowest-doc_id row per fp_norm; struct min compares doc_id
first (unique within a fingerprint), so the surviving rows are identical
by construction. The question is purely physical: WindowGroupLimit pays a
per-partition SORT of every surviving doc before its partial top-1 pass,
the aggregate replaces that sort with a hash table (guide §2.3 "aggregate
before you shuffle" / §2.4) — both shuffle ≤1 row per (fingerprint,
partition).

Usage: python tools/p01_minby_ab.py [window|agg] [runs] [sf_dir]
One shape per process (round-6 lesson: JIT warmup poisons same-JVM A/B).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    shape = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from final_project_big_data_spark.io import load_table
    from final_project_big_data_spark.queries.curation import score_docs
    from final_project_big_data_spark.session import (
        get_spark,
        sized_adaptive_enabled,
        sized_max_partition_bytes,
        sized_shuffle_partitions,
    )

    spark = get_spark(
        app_name="p01_ab",
        shuffle_partitions=sized_shuffle_partitions(sf_dir),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(
                sized_max_partition_bytes(sf_dir)
            ),
            "spark.sql.adaptive.enabled": str(
                sized_adaptive_enabled(sf_dir)
            ).lower(),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def build():
        d = load_table(spark, sf_dir, "documents")
        s = score_docs(d)
        if shape == "window":
            rn = F.row_number().over(
                W.partitionBy("fp_norm").orderBy("doc_id")
            )
            return (
                s.withColumn("rn", rn)
                .filter(F.col("rn") == 1)
                .select("doc_id", "pred_lang", "quality", "n_tokens")
                .orderBy("doc_id")
            )
        keep = F.min(
            F.struct("doc_id", "pred_lang", "quality", "n_tokens")
        ).alias("r")
        return (
            s.groupBy("fp_norm")
            .agg(keep)
            .select("r.doc_id", "r.pred_lang", "r.quality", "r.n_tokens")
            .orderBy("doc_id")
        )

    samples = []
    for i in range(runs + 1):
        df = build()
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        if i:  # run 0 = codegen warmup
            samples.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {"shape": shape, "sf": sf_dir, "min": min(samples), "samples": samples}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
