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

Round 10 (VERDICT r9 #2/#3) additions:
- ``--provider=rocksdb`` runs the whole ladder on the RocksDB state
  store (``RocksDBStateStoreProvider``) instead of the default
  HDFS-backed in-memory map — the knob SCALE.md names for
  GBs-per-executor session state, now exercised, not just cited.
- ``--shatter-users=K`` multiplies distinct-user cardinality a further
  K× (event_id-salted) without changing event volume — pushes
  session-window state harder than the copies dimension alone.
- ladder rungs ``ss_join`` (stream-stream interval join, C15) and
  ``foreach_restart`` (foreachBatch + mid-stream kill + checkpoint
  restart, C16) now run at volume, recording join-state rows (must be
  O(watermark horizon), not O(stream)) and exactly-once row counts
  across the restart.

Round 11 (VERDICT r10 #4): ``--changelog`` enables RocksDB **changelog
checkpointing** (``rocksdb.changelogCheckpointing.enabled`` — per-batch
uploads ship the delta log instead of snapshotting the full store; the
conf the 100 TB posture names for large-state/short-trigger pipelines).
Only meaningful with ``--provider=rocksdb``.

Usage:  python tools/streaming_volume_probe.py [copies] [n_files] [files_per_trigger]
            [--provider=rocksdb] [--changelog] [--shatter-users=K] [--ops=a,b,...]
Prints one JSON line per ladder rung:
  {"op": ..., "rows_in": N, "batches": B, "wall_sec": W,
   "events_per_sec": R, "batch_ms": {"p50": .., "max": ..},
   "state_rows_final": S, "state_mem_mb": M}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_POS = [a for a in sys.argv[1:] if not a.startswith("--")]
_FLAGS = dict(
    (a.lstrip("-").split("=") + ["1"])[:2] for a in sys.argv[1:] if a.startswith("--")
)
COPIES = int(_POS[0]) if len(_POS) > 0 else 100
N_FILES = int(_POS[1]) if len(_POS) > 1 else 20
PER_TRIGGER = int(_POS[2]) if len(_POS) > 2 else 2
PROVIDER = _FLAGS.get("provider", "hdfs")
CHANGELOG = "changelog" in _FLAGS
SHATTER = int(_FLAGS.get("shatter-users", "1"))
ONLY_OPS = set(_FLAGS["ops"].split(",")) if "ops" in _FLAGS else None
OUT = f"/tmp/spark_graft_stream_volume_x{COPIES}" + (
    f"_u{SHATTER}" if SHATTER > 1 else ""
)
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def main() -> None:
    from pyspark.sql import functions as F

    from final_project_big_data_spark.io import load_table
    from final_project_big_data_spark.operators.indexing import with_ntile
    from final_project_big_data_spark.session import get_spark
    from final_project_big_data_spark.streaming import pipeline as P

    extra = {}
    if PROVIDER == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = _ROCKSDB
        if CHANGELOG:
            extra[
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled"
            ] = "true"
    spark = get_spark(app_name="streaming_volume_probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    replay = os.path.join(OUT, "replay")
    if not os.path.isdir(replay):
        base = load_table(spark, SRC, "events")
        copies = F.explode(F.array(*[F.lit(i) for i in range(COPIES)]))
        # --shatter-users: split every user into SHATTER pseudo-users
        # (event-salted, deterministic) — state cardinality rises K×
        # with event volume unchanged
        user = F.col("user_id") * SHATTER + F.col("event_id") % SHATTER
        # cast the copy index to long BEFORE the shift: at >=215 copies
        # c*10_000_000 overflows INT32 and ANSI mode aborts (the same
        # class as scale_probe's STEP lesson, re-found at the 1000× rung)
        c = F.col("c").cast("long")
        scaled = base.withColumn("c", copies).select(
            (F.col("event_id") + c * 10_000_000).alias("event_id"),
            "ts",
            (user + c * 1_000_000 * SHATTER).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        # fan out BEFORE the ntile pipeline: the source fixture is one
        # ~2 MB parquet file → one input partition, and the 1000-copy
        # explode would otherwise materialize 100M rows through a single
        # task in every one of the N_FILES passes (found at the 1000×
        # rung: the first sampling stage alone sat >15 min on one core).
        # The ntile global sort re-ranges anyway, so semantics and file
        # order are unchanged.
        scaled = scaled.repartition(max(32, COPIES // 16))
        tiled = with_ntile(scaled, ["ts", "event_id"], N_FILES, tile_col="_b")
        # ONE partitioned write instead of N_FILES filtered re-executions
        # of the whole explode+rank pipeline (at the 1000× rung the loop
        # shape re-ran a 100M-row sort 20×). Hash-repartitioning on _b
        # puts each tile in exactly one task → exactly one file per
        # batch dir, which the maxFilesPerTrigger replay shape requires;
        # the partition dirs are renamed to the batch_i layout the
        # file-stream reader expects.
        tmp = os.path.join(OUT, "replay_tmp")
        (
            tiled.repartition(N_FILES, "_b")
            .write.mode("overwrite")
            .partitionBy("_b")
            .parquet(tmp)
        )
        os.makedirs(replay, exist_ok=True)
        for i in range(N_FILES):
            os.rename(
                os.path.join(tmp, f"_b={i + 1}"),
                os.path.join(replay, f"batch_{i}"),
            )
        shutil.rmtree(tmp, ignore_errors=True)
    n_rows = (
        spark.read.option("recursiveFileLookup", "true").parquet(replay).count()
    )

    ladder = {
        "tumbling_counts": P.tumbling_counts,
        "session_counts": P.session_counts,
        "dedup_stream": P.dedup_stream,
        # C15 at volume: purchases × clicks interval join, both sides the
        # same replay; join state must stay O(watermark horizon)
        "ss_join": lambda s: P.purchase_click_join(
            s, P.file_stream(spark, replay, files_per_trigger=PER_TRIGGER)
        ),
    }
    for name, op in ladder.items():
        if ONLY_OPS is not None and name not in ONLY_OPS:
            continue
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
        # a rung may carry >1 stateful operator (the symmetric join keeps
        # one store per side) — report their total
        last_ops = next((s for s in reversed(state) if s), [])
        last_state = {
            "numRowsTotal": sum(o.get("numRowsTotal") or 0 for o in last_ops)
            or None,
            "memoryUsedBytes": sum(
                o.get("memoryUsedBytes") or 0 for o in last_ops
            ),
        }
        print(
            json.dumps(
                {
                    "op": name,
                    "provider": PROVIDER + ("+changelog" if CHANGELOG else ""),
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

    if ONLY_OPS is None or "foreach_restart" in ONLY_OPS:
        _foreach_restart_rung(spark, replay, n_rows)
    spark.stop()


def _foreach_restart_rung(spark, replay: str, n_rows: int) -> None:
    """C16 at volume: foreachBatch parquet sink, KILLED mid-stream after a
    few micro-batches, then restarted from the same checkpoint with
    availableNow. Exactly-once across the restart means: no event_id
    appears twice in the sink, and the total equals one clean pass."""
    from pyspark.sql import functions as F

    from final_project_big_data_spark.streaming import pipeline as P

    sink = os.path.join(OUT, "fb_sink")
    ckpt = os.path.join(OUT, "fb_ckpt")
    for p in (sink, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    def build():
        return P.dedup_stream(
            P.file_stream(spark, replay, files_per_trigger=PER_TRIGGER)
        )

    def write_batch(batch_df, epoch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(sink, f"epoch={epoch_id}")
        )

    t0 = time.perf_counter()
    # phase 1: continuous micro-batches, hard-stopped after 3 progresses —
    # the crash we are simulating
    q = (
        build()
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    # stop after 3 input batches; bail out early if the stream drains
    # first (tiny replays) — an empty-input progress after any input
    # means availableNow-equivalent completion
    while True:
        prog = q.recentProgress
        fed = [p for p in prog if p["numInputRows"] > 0]
        drained = fed and any(p["numInputRows"] == 0 for p in prog)
        if len(fed) >= 3 or drained:
            break
        time.sleep(0.5)
    q.stop()
    interrupted_batches = len(
        [p for p in q.recentProgress if p["numInputRows"] > 0]
    )
    # phase 2: restart from the SAME checkpoint, drain the rest
    q2 = (
        build()
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    wall = time.perf_counter() - t0
    out = spark.read.parquet(sink)
    total, distinct = out.agg(
        F.count(F.lit(1)), F.count_distinct("event_id")
    ).collect()[0]
    print(
        json.dumps(
            {
                "op": "foreach_restart",
                "provider": PROVIDER + ("+changelog" if CHANGELOG else ""),
                "rows_in": n_rows,
                "interrupted_after_batches": interrupted_batches,
                "wall_sec": round(wall, 1),
                "events_per_sec": round(n_rows / wall),
                "sink_rows": total,
                "sink_distinct_event_ids": distinct,
                "exactly_once": bool(total == distinct),
            }
        )
    )


if __name__ == "__main__":
    main()
