#!/usr/bin/env python
"""Scale-crossover probe: how the Spark-vs-DuckDB ratio moves with volume.

The per-round bench (bench.py) runs at sf0.1 (~10 MiB/table), where several
headline queries show Spark 2-20x slower than DuckDB. The claim in SCALE.md
is that those ratios are per-stage FIXED overhead (job scheduling, codegen,
exchange setup), not plan defects — so they must shrink as data grows while
the plans stay identical. This probe tests that claim directly:

1. Materializes an N-times-larger copy of the sf0.1 TPC-H tables in /tmp by
   unioning key-shifted copies (every join key shifted by i*10_000_000 per
   copy i, so each copy joins only within itself — the join/agg structure
   scales exactly linearly and stays semantically valid for both engines).
   region/nation are fixed dimensions and are copied unscaled, matching how
   real dimension tables behave under fact growth.
2. Runs the non-events headline queries on BOTH engines at sf0.1 and at the
   scaled dir (same builders, same oracle SQL, min-of-3) and prints one JSON
   line per scale with per-query ratios.

Usage:  python tools/scale_probe.py [copies]   (default 10 = ~sf1)

Scaled tables land in /tmp/spark_graft_scale_probe_x{copies}; events and
documents are copied UNSCALED (byte-identical, preserving the original
writer's TIMESTAMP(NANOS) layout) so the probe dir is also a complete
fixture set for a 10x-volume correctness sweep:

    python -m tests.sweep_registry /tmp/spark_graft_scale_probe_x10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same env knob bench.py honors, so the probe follows the fixture layout
# of whatever machine it runs on (ADVICE r4)
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10_000_000
PROBE = [
    "q01_scan_project",
    "q06_join_inner",
    "q14_multiway_join",
    "q15_hash_aggregate",
    "q22_window_rank",
    "q26_topk",
    "s01_cosine_topk",
]
# key columns to shift per table; every copy i adds i*OFFSET so foreign keys
# keep referencing the same copy and copies never collide (max base key <10M)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]
# copied unscaled so the FULL registry (tests.sweep_registry) can run
# against the probe dir as a 10x-volume correctness sweep: their
# TIMESTAMP(NANOS)/text payloads must keep the original writer's layout
# (io.load_table branches on the scanned events.ts type), and the probe's
# crossover point is made by the scaled TPC-H + embeddings tables
UNSCALED = ["events", "documents"]


def materialize(copies: int) -> str:
    # every table is written to a .tmp sibling and os.replace()d into
    # place: an interrupted COPY can never leave a partial parquet that a
    # later probe/sweep run would silently reuse (ADVICE r4) — the
    # exists-check only ever sees complete files
    import duckdb

    out = f"/tmp/spark_graft_scale_probe_x{copies}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in SHIFT.items():
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        cols = [
            d[0]
            for d in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(copies):
            proj = ", ".join(
                f"({c} + {i * OFFSET}) AS {c}" if c in keys else c
                for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}.tmp' "
            "(FORMAT PARQUET)"
        )
        os.replace(f"{dst}.tmp", dst)
    for t in FIXED:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dst}.tmp' "
                "(FORMAT PARQUET)"
            )
            os.replace(f"{dst}.tmp", dst)
    import shutil

    for t in UNSCALED:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), f"{dst}.tmp")
            os.replace(f"{dst}.tmp", dst)
    return out


def run_probe(spark, specs, sf_dir: str) -> dict:
    import duckdb

    con = duckdb.connect()
    for t in list(SHIFT) + FIXED:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    rows = {}
    for name in PROBE:
        spec = specs[name]
        best_s = best_d = float("inf")
        for _ in range(3):
            df = spec.builder(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best_s = min(best_s, time.perf_counter() - t0)
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            best_d = min(best_d, time.perf_counter() - t0)
        rows[name] = {
            "spark": round(best_s, 3),
            "duckdb": round(best_d, 3),
            "ratio": round(best_s / best_d, 2),
        }
    total_s = round(sum(r["spark"] for r in rows.values()), 3)
    total_d = round(sum(r["duckdb"] for r in rows.values()), 3)
    return {
        "sf_dir": sf_dir,
        "spark_total": total_s,
        "duckdb_total": total_d,
        "ratio": round(total_s / total_d, 2),
        "queries": rows,
    }


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scaled = materialize(copies)

    from final_project_big_data_spark.queries import all_specs
    from final_project_big_data_spark.session import (
        get_spark,
        sized_max_partition_bytes,
        sized_shuffle_partitions,
    )

    specs = all_specs()
    for sf_dir in (SRC, scaled):
        spark = get_spark(
            app_name="scale_probe",
            shuffle_partitions=sized_shuffle_partitions(sf_dir),
            extra_conf={
                "spark.sql.files.maxPartitionBytes": str(
                    sized_max_partition_bytes(sf_dir)
                ),
            },
        )
        spark.range(1000).selectExpr("sum(id)").collect()
        print(json.dumps(run_probe(spark, specs, sf_dir)))
        spark.stop()


if __name__ == "__main__":
    main()
