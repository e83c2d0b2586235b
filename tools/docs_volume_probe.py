#!/usr/bin/env python
"""Volume probe for the round-9 documents operators (d13, d14, p04).

The 100x/1000x scale-probe dirs copy ``documents`` UNSCALED, so the
full-registry sweeps only exercise these entries at 5,000 docs. This
probe materializes a word-tagged scaled corpus (same construction as
tools/lsh_knob_probe.py: every word of copy c prefixed ``c{c}``, so
copies are shingle- and chunk-disjoint and cluster structure grows in
NUMBER, not density) and value-diffs each entry between Spark and the
DuckDB oracle at that volume:

- d13_dedup_apply: mh0 blocking → components → survivor join (the
  recursive-CTE oracle must agree on every survivor + absorbed count)
- d14_cdc_chunks: rolling-hash boundaries → corpus-wide chunk-frequency
  window (the chunk shuffle is the scaled stage)
- p04_temperature_resample: stats-broadcast + map-side epochs (rates
  re-derive from the scaled counts; the oracle replays them)

Usage:  python tools/docs_volume_probe.py [copies]    (default 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
OUT = f"/tmp/spark_graft_docs_volume_x{COPIES}"
ENTRIES = ["d13_dedup_apply", "d14_cdc_chunks", "p04_temperature_resample"]


def main() -> None:
    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    from final_project_big_data_spark.session import get_spark

    spark = get_spark(app_name="docs_volume_probe")
    docs_path = os.path.join(OUT, "documents.parquet")
    if not os.path.exists(docs_path):
        base = spark.read.parquet(f"{SRC}/documents.parquet")
        copies = F.array(*[F.lit(i) for i in range(COPIES)])
        scaled = (
            base.withColumn("c", F.explode(copies))
            .select(
                (F.col("doc_id") + F.col("c") * 100_000).alias("doc_id"),
                F.expr(
                    "array_join(transform(split(trim(text), '\\\\s+'),"
                    " w -> concat('c', cast(c AS string), w)), ' ')"
                ).alias("text"),
                "lang",
                "source",
            )
            .withColumn("n_chars", F.length("text").cast("long"))
        )
        scaled.repartition(32).write.mode("overwrite").parquet(docs_path)
    n_docs = spark.read.parquet(docs_path).count()

    from final_project_big_data_spark.queries import all_specs

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{docs_path}/*.parquet'"
    )
    report = {"n_docs": n_docs, "entries": {}}
    ok = True
    for name in ENTRIES:
        spec = all_specs()[name]
        t0 = time.perf_counter()
        sp = spec.builder(spark, OUT).toPandas()
        t_spark = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        du = con.execute(spec.oracle).df()
        t_duck = round(time.perf_counter() - t0, 1)
        sp = sp[sorted(sp.columns)].reset_index(drop=True)
        du = du[sorted(du.columns)].reset_index(drop=True)
        du = du.astype(dict(sp.dtypes))
        # assert_frame_equal raises on mismatch — convert to a boolean so
        # a divergence is reported in the per-entry JSON line and final
        # report instead of killing the probe mid-loop (ADVICE r9).
        match = len(sp) == len(du)
        if match:
            try:
                pd.testing.assert_frame_equal(sp, du, check_exact=False)
            except AssertionError:
                match = False
        report["entries"][name] = {
            "rows": len(sp),
            "values_match": match,
            "spark_sec": t_spark,
            "duck_sec": t_duck,
        }
        print(json.dumps({name: report["entries"][name]}), flush=True)
        ok = ok and match
    print(json.dumps(report))
    assert ok, "value mismatch at volume"
    spark.stop()


if __name__ == "__main__":
    main()
