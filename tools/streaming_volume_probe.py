#!/usr/bin/env python
"""Stateful-streaming volume probe (round 9, VERDICT r8 #6).

The C09-C16 batch-equivalence suite runs at fixture scale (100k events);
this probe runs the stateful ladder — tumbling window agg, session
windows, streaming dedup — against a 100× events replay (10M events,
100× the distinct-user state cardinality) with per-micro-batch rate
limiting, and records what the suite cannot: per-batch latency and
state-store growth from ``StreamingQueryProgress``.

Scaling shape: 100 key-shifted copies of the sf0.1 events UNIONed with
unchanged timestamps — a real 100× stream has more events and more
users in the SAME time range, so watermark semantics are untouched
while state rows scale 100×. Replay files are time-ordered (ntile on
ts) so late-data drops stay the semantic ones.

Usage:  python tools/streaming_volume_probe.py [copies] [n_files] [files_per_trigger]
Prints one JSON line per ladder rung:
  {"op": ..., "rows_in": N, "batches": B, "wall_sec": W,
   "events_per_sec": R, "batch_ms": {"p50": .., "max": ..},
   "state_rows_final": S, "state_mem_mb": M}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
N_FILES = int(sys.argv[2]) if len(sys.argv) > 2 else 20
PER_TRIGGER = int(sys.argv[3]) if len(sys.argv) > 3 else 2
OUT = f"/tmp/spark_graft_stream_volume_x{COPIES}"


def main() -> None:
    from pyspark.sql import functions as F

    from final_project_big_data_spark.io import load_table
    from final_project_big_data_spark.operators.indexing import with_ntile
    from final_project_big_data_spark.session import get_spark
    from final_project_big_data_spark.streaming import pipeline as P

    spark = get_spark(app_name="streaming_volume_probe")
    spark.sparkContext.setLogLevel("ERROR")

    replay = os.path.join(OUT, "replay")
    if not os.path.isdir(replay):
        base = load_table(spark, SRC, "events")
        copies = F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
        scaled = base.withColumn("c", copies).select(
            (F.col("event_id") + F.col("c") * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("c") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        tiled = with_ntile(scaled, ["ts", "event_id"], N_FILES, tile_col="_b")
        for i in range(N_FILES):
            (
                tiled.filter(F.col("_b") == i + 1)
                .drop("_b")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(replay, f"batch_{i}"))
            )
    n_rows = (
        spark.read.option("recursiveFileLookup", "true").parquet(replay).count()
    )

    ladder = {
        "tumbling_counts": P.tumbling_counts,
        "session_counts": P.session_counts,
        "dedup_stream": P.dedup_stream,
    }
    for name, op in ladder.items():
        stream = op(P.file_stream(spark, replay, files_per_trigger=PER_TRIGGER))
        t0 = time.perf_counter()
        q = (
            stream.writeStream.format("noop")
            .outputMode("append")
            .option(
                "checkpointLocation",
                os.path.join(OUT, f"ckpt_{name}_{int(t0)}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
        batch_ms = sorted(p["batchDuration"] for p in prog)
        state = [p.get("stateOperators") or [] for p in prog]
        last_state = next(
            (s[0] for s in reversed(state) if s), {}
        )
        print(
            json.dumps(
                {
                    "op": name,
                    "rows_in": n_rows,
                    "batches": len(prog),
                    "wall_sec": round(wall, 1),
                    "events_per_sec": round(n_rows / wall),
                    "batch_ms": {
                        "p50": batch_ms[len(batch_ms) // 2] if batch_ms else None,
                        "max": batch_ms[-1] if batch_ms else None,
                    },
                    "state_rows_final": last_state.get("numRowsTotal"),
                    "state_mem_mb": round(
                        (last_state.get("memoryUsedBytes") or 0) / 1048576, 1
                    ),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
