#!/usr/bin/env python
"""q14 1000x decomposition study (round 11, VERDICT r10 #1).

q14 (TPC-H Q3 shape) is the one headline query whose 1000x ratio stays
>8x where DuckDB wins on plan, not scheduler floor. VERDICT r10 asks to
either (a) show the headline shape over the hive-partitioned layout +
stats reaches <=2x, or (b) decompose the residual into NAMED floors with
a pinned-plan argument the Spark plan is already minimal.

This probe does both measurements at the given copies (default 1000,
600M-row lineitem):

1. **Stage decomposition, flat layout, both engines** — times three
   nested prefixes of the same plan so the residual has names:
   - ``scan``: lineitem shipdate-filter + 3-col project (the bytes
     DuckDB's late-materializing scan reads lazily);
   - ``preagg``: + groupBy(l_orderkey).sum — the round-6 eager pre-agg
     stage, kept as a named stage precisely because this study found it
     to BE the gap (SCALE.md r11) and the headline reverted to
     join-first;
   - ``full``: + orders/customer joins + top-k (the registry builder —
     join-first from round 11; set SPARK_GRAFT_Q14_PREAGG=1 to time the
     historical shape).
   DuckDB runs the same prefixes compute-only (CTAS temp, the noop-sink
   analogue).
2. **Headline shape over the month-partitioned layout** (reuses
   tools/scale_probe.materialize_partitioned): the registry builder's
   pre-agg shape with the lineitem scan swapped for the pruned
   hive-partitioned read; DuckDB reads the same layout with
   hive_partitioning=1, so both engines prune.

Usage:  python tools/q14_volume_study.py [copies] [runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, runs):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    import duckdb

    from pyspark.sql import functions as F

    from final_project_big_data_spark.io import load_table
    from final_project_big_data_spark.queries import all_specs
    from final_project_big_data_spark.session import get_spark
    from tools.scale_probe import materialize, materialize_partitioned

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    copies = int(args[0]) if args else 1000
    runs = int(args[1]) if len(args) > 1 else 3

    if "--materialize-only" in sys.argv:
        # the one-shot partitioned rewrite shuffles the FULL-WIDTH fact
        # (600M rows x 16 cols at 1000x, ~40 GB of lz4 shuffle blocks) —
        # on the session factory's tmpfs local dir that is a kernel OOM
        # (measured: 116 GB of dead shuffle in /dev/shm killed the JVM),
        # and even on disk it races the 56 GB free. So this phase runs in
        # its own process with SPARK_LOCAL_DIRS on disk (the
        # sweep_registry rule) AND, at >=1000 copies, writes YEAR BY YEAR:
        # same final layout (one file per l_shipym dir), but each job's
        # shuffle is ~1/7 of the fact and is GC-reclaimed before the next
        # — peak scratch stays bounded by a year, not the decade. The
        # exact trick a real warehouse backfill uses.
        spark = get_spark(app_name="q14_materialize")
        spark.sparkContext.setLogLevel("ERROR")
        try:
            flat = materialize(copies)
            if copies < 1000:
                materialize_partitioned(spark, copies)
                return
            from pyspark.sql import functions as F

            from final_project_big_data_spark.io import load_table

            out = f"{flat}_part"
            dst = os.path.join(out, "lineitem.parquet")
            if os.path.exists(dst):
                return
            os.makedirs(out, exist_ok=True)
            tmp = f"{dst}.tmp"
            li = load_table(spark, flat, "lineitem").withColumn(
                "l_shipym", F.date_format("l_shipdate", "yyyy-MM")
            )
            years = [
                r[0]
                for r in li.select(
                    F.year("l_shipdate").alias("y")
                ).distinct().collect()
            ]
            for y in sorted(years):
                (
                    li.filter(F.year("l_shipdate") == y)
                    .repartition(F.col("l_shipym"))
                    .write.mode("append")
                    .partitionBy("l_shipym")
                    .parquet(tmp)
                )
                # release the finished job's ShuffleDependency now so its
                # shuffle blocks free before the next year's job needs
                # the disk (ContextCleaner acts on JVM GC)
                spark.sparkContext._jvm.System.gc()
            os.rename(tmp, dst)
        finally:
            spark.stop()
        return

    part_dst = f"/tmp/spark_graft_scale_probe_x{copies}_part/lineitem.parquet"
    if not os.path.exists(part_dst):
        import subprocess

        env = dict(os.environ, SPARK_LOCAL_DIRS="/tmp/q14_mat_local")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(copies),
             "--materialize-only"],
            check=True,
            env=env,
        )

    spark = get_spark(app_name="q14_volume_study")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        flat = materialize(copies)
        part = materialize_partitioned(spark, copies)

        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{flat}/{t}.parquet'"
            )

        def noop(df):
            df.write.mode("overwrite").format("noop").save()

        def ctas(sql):
            con.execute(
                "CREATE OR REPLACE TEMPORARY TABLE _q14_sink AS " + sql
            )

        out = {"probe": "q14_volume_study", "copies": copies, "runs": runs}

        # ---- 1. stage decomposition (flat) -------------------------------
        li = load_table(spark, flat, "lineitem")
        scan = li.filter(
            F.col("l_shipdate").cast("date") > F.lit("1998-01-01").cast("date")
        ).select("l_orderkey", "l_extendedprice", "l_discount")
        preagg = scan.groupBy("l_orderkey").agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_rev"
            )
        )
        full = all_specs()["q14_multiway_join"].builder(spark, flat)
        duck_scan = (
            "SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem "
            "WHERE l_shipdate > TIMESTAMP '1998-01-01'"
        )
        duck_preagg = (
            "SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) "
            "AS _rev FROM lineitem "
            "WHERE l_shipdate > TIMESTAMP '1998-01-01' GROUP BY l_orderkey"
        )
        duck_full = all_specs()["q14_multiway_join"].oracle
        stages = {}
        for name, df, sql in (
            ("scan", scan, duck_scan),
            ("preagg", preagg, duck_preagg),
            ("full", full, duck_full),
        ):
            s = _time(lambda: noop(df), runs)
            d = _time(lambda: ctas(sql), runs)
            stages[name] = {
                "spark": s,
                "duckdb": d,
                "ratio": round(s / d, 2),
            }
        out["stages_flat"] = stages

        # ---- 2. headline shape over the partitioned layout ---------------
        li_part = spark.read.parquet(
            os.path.join(part, "lineitem.parquet")
        ).filter(F.col("l_shipym") >= "1998-01")

        def headline_part():
            c = load_table(spark, flat, "customer").filter(
                F.col("c_mktsegment") == "BUILDING"
            )
            o = load_table(spark, flat, "orders").filter(
                F.col("o_orderdate").cast("date")
                < F.lit("1998-01-01").cast("date")
            )
            lp = li_part.filter(
                F.col("l_shipdate").cast("date")
                > F.lit("1998-01-01").cast("date")
            )
            rev = lp.groupBy("l_orderkey").agg(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("_rev")
            )
            return (
                rev.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
                .join(c, F.col("c_custkey") == F.col("o_custkey"))
                .select(
                    "l_orderkey",
                    F.round(F.col("_rev"), 4).alias("revenue"),
                    F.col("o_orderdate").cast("date").alias("orderdate"),
                )
                .orderBy(F.desc("revenue"), "l_orderkey")
                .limit(20)
            )

        # identical result to the flat headline (partition predicate is
        # the month floor of the row predicate, which stays)
        assert [tuple(r) for r in headline_part().collect()] == [
            tuple(r) for r in full.collect()
        ]
        li_part_sql = (
            "SELECT * FROM read_parquet("
            f"'{part}/lineitem.parquet/*/*.parquet', hive_partitioning=1) "
            "WHERE l_shipym >= '1998-01'"
        )
        duck_full_part = duck_full.replace(
            "JOIN lineitem", f"JOIN ({li_part_sql}) lineitem"
        )
        s = _time(lambda: noop(headline_part()), runs)
        d = _time(lambda: ctas(duck_full_part), runs)
        out["partitioned_headline"] = {
            "spark": s,
            "duckdb": d,
            "ratio": round(s / d, 2),
        }
        con.execute("DROP TABLE IF EXISTS _q14_sink")
        print(json.dumps(out), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
