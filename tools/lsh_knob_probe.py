#!/usr/bin/env python
"""d03 derived-band knob probe: oracle-check the r=4 regime (round 9).

The 100x/1000x scale-probe dirs copy ``documents`` UNSCALED (5,000 docs
from sf0.1), so the full-registry sweeps exercise the derived LSH knob
only at its middle setting (1k <= n < 1M -> r=2, b=4). This probe
materializes a documents corpus PAST the 1M-row threshold (250
word-tagged copies of the sf0.1 corpus = 1.25M docs -> r=4, b=2) and
value-diffs d03 between Spark and DuckDB there — so every level of the
knob CASE has a recorded cross-engine hash match:

    r=1 (n<1k):   sf0.001 planted fixtures + sf0.001 driver rounds
    r=2 (n<1M):   sf0.01/sf0.1 sweeps + 100x/1000x probe dirs
    r=4 (n>=1M):  THIS probe

Word-tagging (every word of copy c prefixed with ``c{c}``) makes copies
shingle-disjoint, so the corpus has no cross-copy near-dups and the
banded self-join's output stays pair-sparse — which is exactly the
at-scale claim under test: with r=4 the background collision rate
j_bg^4 keeps bucket loads bounded at millions of docs.

Usage:  python tools/lsh_knob_probe.py [copies]    (default 250)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 250
OUT = f"/tmp/spark_graft_lsh_knob_x{COPIES}"


def main() -> None:
    from pyspark.sql import functions as F

    from final_project_big_data_spark.session import get_spark

    spark = get_spark(app_name="lsh_knob_probe")
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

    spec = all_specs()["d03_minhash_lsh_pairs"]
    t0 = time.perf_counter()
    spark_rows = spec.builder(spark, OUT).collect()
    t_spark = round(time.perf_counter() - t0, 1)

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{docs_path}/*.parquet'"
    )
    t0 = time.perf_counter()
    duck_rows = con.execute(spec.oracle).fetchall()
    t_duck = round(time.perf_counter() - t0, 1)

    s = sorted((r.doc_a, r.doc_b, r.n_bands) for r in spark_rows)
    d = sorted((a, b, int(nb)) for a, b, nb in duck_rows)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "expected_r": 4,
                "spark_pairs": len(s),
                "duck_pairs": len(d),
                "values_match": s == d,
                "spark_sec": t_spark,
                "duck_sec": t_duck,
            }
        )
    )
    assert s == d, "value mismatch between Spark and DuckDB at r=4"
    spark.stop()


if __name__ == "__main__":
    main()
