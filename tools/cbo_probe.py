#!/usr/bin/env python
"""CBO join-reorder probe (round 11, VERDICT r10 #2 — the measured half).

tests/test_cbo.py pins THAT stats-backed CBO reorders the badly-ordered
q113 join (selective dim below the fact-fact join) where AQE alone does
not. This probe records what the reorder BUYS at volume: the q113 shape
over the 100× fixture (60M-row lineitem), min-of-N noop-sink wall time
with CBO off vs on, plus the one-time ANALYZE cost the stats path pays.

Usage:  python tools/cbo_probe.py [probe_dir] [n]
        (default: materializes /tmp/spark_graft_scale_probe_x100 via
        tools/scale_probe.materialize — reused if already present)

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    from final_project_big_data_spark.io import register_stats_tables
    from final_project_big_data_spark.queries.layout import _CBO_TABLES, _q113_sql
    from final_project_big_data_spark.session import get_spark

    if len(sys.argv) > 1:
        sf = sys.argv[1]
    else:
        from tools.scale_probe import materialize

        sf = materialize(100)
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark(app_name="cbo_probe")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        analyze_sec = _timed(
            lambda: register_stats_tables(spark, sf, list(_CBO_TABLES))
        )
        import hashlib

        db = f"sg_stats_{hashlib.md5(sf.encode()).hexdigest()[:12]}"
        sql = _q113_sql(f"{db}.")

        def run():
            spark.sql(sql).write.mode("overwrite").format("noop").save()

        import re

        def join_order():
            s = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
            return re.findall(r"Relation spark_catalog\.\w+\.(\w+)", s)

        out = {"sf_dir": sf, "analyze_sec": analyze_sec, "runs": n}
        for mode, flag in (("cbo_off", "false"), ("cbo_on", "true")):
            spark.conf.set("spark.sql.cbo.enabled", flag)
            spark.conf.set("spark.sql.cbo.joinReorder.enabled", flag)
            out[f"{mode}_join_order"] = join_order()
            secs = [_timed(run) for _ in range(n)]
            out[f"{mode}_sec"] = min(secs)
            out[f"{mode}_spread"] = [min(secs), max(secs)]
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        out["speedup"] = round(out["cbo_off_sec"] / out["cbo_on_sec"], 3)
        print(json.dumps(out), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
