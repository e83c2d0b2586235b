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
    # label is a BLOCK KEY (d06 joins within equal labels): scaling must
    # grow the NUMBER of blocks, not their density — shifting vec_id
    # alone made label blocks 100x denser at the 100x probe and the
    # label-blocked pair count grew 10,000x (quadratic in density; the
    # first guarded sweep hung there). Real corpora grow in number of
    # near-dup groups at roughly constant group size, which per-copy
    # label shifting reproduces exactly.
    "embeddings": ["vec_id", "label"],
}
# per-column shift step overrides: label is a SELF-CONTAINED block key
# (nothing joins it across tables), base cardinality 10 — spacing 1000
# keeps it unique per copy while fitting its INT32 schema type at any
# copy count up to ~2.1M (the default 1e7 step overflows INT32 past
# ~214 copies; the 1000x run caught the silent BIGINT widening, which
# io.load_table's schema check then rejected)
STEP = {("embeddings", "label"): 1_000}
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
    # COPY of the copies-cross-product must STREAM, not buffer: with
    # insertion order preserved DuckDB held the whole 600M-row lineitem
    # product in RAM (>100 GB RSS observed at 1000 copies on a 128 GB
    # host) before writing a byte. Row order within the output parquet
    # is irrelevant to every consumer (both engines read the same file),
    # so drop the ordering guarantee and cap the buffer.
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='32GB'")
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
        # one scan cross-joined against generate_series, not a UNION ALL
        # per copy: the union form hit DuckDB's max_expression_depth at
        # 1000 copies, and a single-pass multiply scales to any factor.
        # Shifted columns are CAST back to their scanned type — BIGINT
        # g.i would otherwise silently widen INT32 keys (and a genuine
        # overflow now fails the cast loudly instead of widening).
        types = dict(
            (d[0], d[1])
            for d in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        )
        proj = ", ".join(
            f"CAST({c} + g.i * {STEP.get((t, c), OFFSET)} "
            f"AS {types[c]}) AS {c}"
            if c in keys
            else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {proj} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(generate_series(0, {copies - 1})) AS i) g) "
            f"TO '{dst}.tmp' (FORMAT PARQUET)"
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
        # COMPUTE-ONLY on the DuckDB side (CTAS into a temp table), the
        # analogue of Spark's noop sink. Rounds 1-4 timed fetchall(),
        # which charges DuckDB for materializing the result as Python
        # objects — a cost the Spark side never pays. Invisible at sf0.1
        # result sizes; at the 100x probe q01's 60M-row result made
        # fetchall 44.6 s against 3.6 s of actual compute, manufacturing
        # a fake crossover. The residual asymmetry now favors DuckDB's
        # side being charged a buffer write that noop skips — small, and
        # biased AGAINST the number we report.
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(
                f"CREATE OR REPLACE TEMPORARY TABLE _probe_sink AS "
                f"({spec.oracle})"
            )
            best_d = min(best_d, time.perf_counter() - t0)
        con.execute("DROP TABLE IF EXISTS _probe_sink")
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


def materialize_partitioned(spark, copies: int) -> str:
    """Hive-partition the x{copies} lineitem by ship year-month.

    SCALE.md's round-4 explanation for q14's ~15x per-query gap (DuckDB's
    late-materializing scan vs Spark decoding every projected column of
    every surviving row group) claimed date-partitioned layouts remove it
    at cluster scale — previously argued, never measured (VERDICT r4
    item 2). This writes the layout a production table would use
    (``io.write_parquet(partition_by=['l_shipym'])``) so
    :func:`run_pruning_probe` can time q14's shape against it on BOTH
    engines: DuckDB gets the same hive layout + pruning predicate, so the
    comparison stays engine-fair.
    """
    from pyspark.sql import functions as F

    from final_project_big_data_spark.io import load_table, write_parquet

    src = f"/tmp/spark_graft_scale_probe_x{copies}"
    out = f"{src}_part"
    dst = os.path.join(out, "lineitem.parquet")
    if os.path.exists(dst):
        return out
    os.makedirs(out, exist_ok=True)
    li = load_table(spark, src, "lineitem").withColumn(
        "l_shipym", F.date_format("l_shipdate", "yyyy-MM")
    )
    # cluster by the partition key BEFORE writing: without this every
    # write task emits a fragment into every month directory
    # (tasks x months tiny files — measured 11x slower to scan than the
    # flat layout, burying the pruning win under file-open overhead).
    # One shuffle at write time => one file per month partition; the
    # same rule a production date-partitioned table applies.
    write_parquet(
        li.repartition(F.col("l_shipym")), f"{dst}.tmp",
        partition_by=["l_shipym"],
    )
    os.rename(f"{dst}.tmp", dst)
    return out


def run_pruning_probe(spark, specs, copies: int) -> dict:
    """q14's shape, flat vs ship-month-partitioned lineitem, both engines.

    The partitioned variant adds the partition predicate a production
    date-partitioned query carries (``l_shipym >= '1998-01'`` — the
    month floor of q14's ``l_shipdate > 1998-01-01`` filter, pruning
    ~43% of the 83 month partitions); the row predicate stays, so the
    result set is IDENTICAL to flat q14 (asserted on row counts).
    """
    import duckdb

    from pyspark.sql import functions as F

    from final_project_big_data_spark.io import load_table

    flat = f"/tmp/spark_graft_scale_probe_x{copies}"
    part = materialize_partitioned(spark, copies)

    def q14_shape(li):
        c = load_table(spark, flat, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        o = load_table(spark, flat, "orders").filter(
            F.col("o_orderdate").cast("date")
            < F.lit("1998-01-01").cast("date")
        )
        li = li.filter(
            F.col("l_shipdate").cast("date")
            > F.lit("1998-01-01").cast("date")
        )
        return (
            c.join(o, c.c_custkey == o.o_custkey)
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate")
            .agg(
                F.round(
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ),
                    4,
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), "l_orderkey")
            .limit(20)
        )

    li_flat = load_table(spark, flat, "lineitem")
    li_part = spark.read.parquet(os.path.join(part, "lineitem.parquet")).filter(
        F.col("l_shipym") >= "1998-01"
    )
    assert q14_shape(li_part).count() == q14_shape(li_flat).count()

    def time_spark(df, runs=3):
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    duck_q14 = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN ({li}) l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 20
    """
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{flat}/{t}.parquet'"
        )
    li_flat_sql = f"SELECT * FROM '{flat}/lineitem.parquet'"
    li_part_sql = (
        "SELECT * FROM read_parquet("
        f"'{part}/lineitem.parquet/*/*.parquet', hive_partitioning=1) "
        "WHERE l_shipym >= '1998-01'"
    )

    def time_duck(li_sql, runs=3):
        # 20-row result: fetchall vs CTAS is indistinguishable here, but
        # keep the compute-only convention uniform across the probe
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(
                "CREATE OR REPLACE TEMPORARY TABLE _prune_sink AS "
                + duck_q14.format(li=li_sql)
            )
            best = min(best, time.perf_counter() - t0)
        con.execute("DROP TABLE IF EXISTS _prune_sink")
        return round(best, 3)

    rows = {
        "flat": {
            "spark": time_spark(q14_shape(li_flat)),
            "duckdb": time_duck(li_flat_sql),
        },
        "partitioned": {
            "spark": time_spark(q14_shape(li_part)),
            "duckdb": time_duck(li_part_sql),
        },
    }
    for r in rows.values():
        r["ratio"] = round(r["spark"] / r["duckdb"], 2)
    return {"probe": "q14_partition_pruning", "copies": copies, **rows}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    copies = int(args[0]) if args else 10
    scaled = materialize(copies)

    from final_project_big_data_spark.queries import all_specs
    from final_project_big_data_spark.session import (
        get_spark,
        sized_max_partition_bytes,
        sized_shuffle_partitions,
    )

    specs = all_specs()
    dirs = (scaled,) if "--pruning-only" in sys.argv else (SRC, scaled)
    for sf_dir in dirs:
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
        if "--pruning-only" not in sys.argv:
            print(json.dumps(run_probe(spark, specs, sf_dir)))
        if sf_dir == scaled and (
            "--pruning" in sys.argv or "--pruning-only" in sys.argv
        ):
            print(json.dumps(run_pruning_probe(spark, specs, copies)))
        spark.stop()


if __name__ == "__main__":
    main()
