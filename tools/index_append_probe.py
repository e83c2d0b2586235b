#!/usr/bin/env python
"""Incremental-index maintenance probe (round 10, VERDICT r9 #6).

s08/s09 pin the CORRECTNESS of the persisted-index append paths
(append(A,B) == fresh(A∪B), cross-engine). This probe records their
ECONOMICS at the 100× fixture (200k vectors) — the reason the append
path exists at all:

- fresh full rebuild vs base(90%)-build + append(10%) wall time, per
  index family (LSH hash tables, IVF inverted lists);
- file fragmentation: the 10% delta applied as 5 sequential append
  batches, max files-per-partition before/after
  ``compact_ivf_postings``, and the served query's wall time in the
  fragmented vs compacted layout.

Usage:  python tools/index_append_probe.py [probe_dir]
        (default: materializes /tmp/spark_graft_scale_probe_x100 via
        tools/scale_probe.materialize — reused if already present)

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


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def _timed_min(fn, n=3):
    """min-of-n wall time — equalizes JVM/codegen/page-cache warm-up so the
    fragmented-vs-compacted query comparison reads layout, not cache state
    (ADVICE r10: a single fragmented-first reading handed the compacted
    layout a warm-cache head start)."""
    return min(_timed(fn) for _ in range(n))


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def _max_files(path: str) -> int:
    worst = 0
    for d in os.listdir(path):
        full = os.path.join(path, d)
        if "=" in d and os.path.isdir(full):
            n = sum(1 for f in os.listdir(full) if f.endswith(".parquet"))
            worst = max(worst, n)
    return worst


def main() -> None:
    from pyspark.sql import functions as F

    from final_project_big_data_spark.io import load_table
    from final_project_big_data_spark.operators.ivf_index import (
        append_to_ivf_index,
        append_to_lsh_index,
        compact_ivf_postings,
        ivf_topk_with_index,
        lsh_topk_with_index,
        save_ivf_index,
        save_lsh_index,
    )
    from final_project_big_data_spark.plans.parallelism import widen
    from final_project_big_data_spark.session import get_spark

    if len(sys.argv) > 1:
        sf = sys.argv[1]
    else:
        from tools.scale_probe import materialize

        sf = materialize(100)

    spark = get_spark(app_name="index_append_probe")
    spark.sparkContext.setLogLevel("ERROR")

    emb = widen(load_table(spark, sf, "embeddings"))
    n = emb.count()
    base_pred = F.col("vec_id") % 10 != 0
    # the 10% delta, applied as 5 sequential batches (vec_id % 50 ∈
    # {0,10,20,30,40}) — the nightly-crawl shape that fragments lists
    batches = [
        emb.filter(F.col("vec_id") % 50 == r).select("vec_id", "embedding")
        for r in (0, 10, 20, 30, 40)
    ]

    try:
        for family, save, append, query, subdir in (
            ("lsh", save_lsh_index, append_to_lsh_index, lsh_topk_with_index,
             "tables"),
            ("ivf", save_ivf_index, append_to_ivf_index, ivf_topk_with_index,
             "postings"),
        ):
            fresh_path = f"/tmp/idx_probe_{family}_fresh"
            inc_path = f"/tmp/idx_probe_{family}_inc"
            for p in (fresh_path, inc_path):
                shutil.rmtree(p, ignore_errors=True)

            fresh_sec = _timed(lambda: save(spark, sf, fresh_path))
            base_sec = _timed(
                lambda: save(spark, sf, inc_path, where=base_pred)
            )
            # per-batch timings so SCALE.md's "2%-delta append" marginal
            # numbers are directly reproducible from this JSON (ADVICE r10:
            # the doc previously hand-divided the 5-batch total by 5)
            append_batch_secs = [
                _timed(lambda b=b: append(spark, inc_path, b))
                for b in batches
            ]
            append_sec = round(sum(append_batch_secs), 2)
            part_dir = os.path.join(inc_path, subdir)
            frag_files = _max_files(part_dir)
            # min-of-3 on BOTH layouts: the first fragmented run also
            # serves as warm-up, so fragmented vs compacted compare at
            # equal cache/JVM state (ADVICE r10)
            frag_query_sec = _timed_min(
                lambda: _noop(query(spark, inc_path, N_QUERIES))
            )
            rewrote = False

            def _compact():
                nonlocal rewrote
                rewrote = compact_ivf_postings(
                    spark, inc_path, subdir=subdir, max_files_per_list=4
                )

            compact_sec = _timed(_compact)
            compact_files = _max_files(part_dir)
            compact_query_sec = _timed_min(
                lambda: _noop(query(spark, inc_path, N_QUERIES))
            )
            print(
                json.dumps(
                    {
                        "index": family,
                        "vectors": n,
                        "fresh_build_sec": fresh_sec,
                        "base_build_sec": base_sec,
                        "append_10pct_sec": append_sec,
                        "append_per_batch_sec": append_batch_secs,
                        "append_vs_rebuild": round(append_sec / fresh_sec, 3),
                        "max_files_per_list_fragmented": frag_files,
                        "max_files_per_list_compacted": compact_files,
                        "compact_rewrote": rewrote,
                        "compact_sec": compact_sec,
                        "query_sec_fragmented": frag_query_sec,
                        "query_sec_compacted": compact_query_sec,
                    }
                ),
                flush=True,
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
