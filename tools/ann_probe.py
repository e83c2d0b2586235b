#!/usr/bin/env python
"""ANN plan-choice probe: where does LSH actually beat brute force?

The bench `ann` row and the 100× spot-run (SCALE.md round 5) showed the
zero-shuffle broadcast brute-force (s01's plan) beating the LSH bucket
join (s02's plan) at the registry's 10-probe workload — the corpus-wide
signature pass + bucket shuffle costs more than it saves when the probe
set is tiny. This probe measures the other regime: probe counts scaling
up at a fixed corpus, where brute force grows O(probes × corpus) while
LSH grows O(corpus + probes × bucket_size).

Usage:  python tools/ann_probe.py [copies] [probe_counts ...]
        (default: copies=100, probes 10 100 1000)

Prints one JSON line per probe count with both Spark timings and the
candidate-pair counts (the quantity LSH exists to shrink).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from final_project_big_data_spark.io import load_table  # noqa: E402
from final_project_big_data_spark.operators.vector import (  # noqa: E402
    dot_fold as _dot,
)
from final_project_big_data_spark.plans.parallelism import widen  # noqa: E402
from final_project_big_data_spark.queries.similarity import (  # noqa: E402
    _LSH_SEED,
    _N_PLANES,
    _hyperplanes,
)

TOP_K = 5


def corpus(spark, sf_dir):
    e = widen(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return e.withColumn("nv", F.sqrt(_dot(F.col("v"), F.col("v"))))


def brute_topk(en, n_probes):
    """s01's plan shape: broadcast probes × corpus, window top-k."""
    q = en.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    scored = en.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cs"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def lsh_scored(en, n_probes):
    """s02's plan shape up to candidate scoring: hyperplane signature →
    multiprobe bucket equi-join → exact cosine on candidates."""
    planes = _hyperplanes(64, _N_PLANES, _LSH_SEED)
    sig_col = None
    for i, row in enumerate(planes):
        bit = F.when(
            _dot(F.array(*[F.lit(x) for x in row]), F.col("v")) >= 0,
            F.lit(1 << (_N_PLANES - 1 - i)),
        ).otherwise(F.lit(0))
        sig_col = bit if sig_col is None else (sig_col + bit)
    sig = en.withColumn("bucket", sig_col)
    flips = [0] + [1 << i for i in range(_N_PLANES)]
    probes = (
        sig.filter(F.col("vec_id") < n_probes)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
            F.explode(
                F.array(*[
                    F.col("bucket").bitwiseXOR(F.lit(f)) for f in flips
                ])
            ).alias("probe"),
        )
    )
    cand = sig.join(
        F.broadcast(probes),
        (F.col("probe") == F.col("bucket"))
        & (F.col("query_id") != F.col("vec_id")),
    )
    return cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (_dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))).alias("cs"),
    )


def lsh_topk(en, n_probes):
    scored = lsh_scored(en, n_probes)
    w = W.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def ivf_topk(spark, sf_dir, n_probes):
    """s03's plan shape with a parameterized probe set: IVF coarse
    quantization (data-derived k=⌈√n⌉, one Lloyd pass) → inverted-list
    equi-join on centroid id → exact cosine re-rank. Index build cost is
    INSIDE the timing — the honest single-query convention; a deployment
    amortizes the build across queries (noted in SCALE.md)."""
    from final_project_big_data_spark.queries.similarity import (
        _MAX_NPROBE,
        _MIN_NPROBE,
        _ivf_assigned,
    )

    en, cents, assigned, kdf = _ivf_assigned(spark, sf_dir)
    npdf = kdf.select(
        F.greatest(
            F.lit(_MIN_NPROBE),
            F.least(F.lit(_MAX_NPROBE), F.ceil(F.col("k") / F.lit(8.0))),
        )
        .cast("int")
        .alias("np")
    )
    # probe-side affinity rebuilt like s03: the exploded (probe, centroid)
    # shape is bounded at n_probes×k rows because the filter lands first
    aff = en.filter(F.col("vec_id") < n_probes).join(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "nv",
        F.struct(
            (_dot(F.col("v"), F.col("cv")) / (F.col("nv") * F.col("nc"))).alias(
                "aff"
            ),
            F.col("centroid_id"),
        ).alias("ac"),
    )
    wq = W.partitionBy("vec_id").orderBy(
        F.desc(F.col("ac.aff")), F.asc(F.col("ac.centroid_id"))
    )
    probes = (
        aff.withColumn("pr", F.row_number().over(wq))
        .crossJoin(F.broadcast(npdf))
        .filter(F.col("pr") <= F.col("np"))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
            F.col("ac.centroid_id").alias("probe_centroid"),
        )
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
    w = W.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        probes.join(
            assigned,
            (F.col("probe_centroid") == F.col("centroid_id"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cs")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
    )


def timed_noop(df, runs=3):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    probe_counts = [int(a) for a in sys.argv[2:]] or [10, 100, 1000]
    sf_dir = (
        f"/tmp/spark_graft_scale_probe_x{copies}"
        if copies > 1
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )

    from final_project_big_data_spark.session import (
        get_spark,
        sized_max_partition_bytes,
        sized_shuffle_partitions,
    )

    spark = get_spark(
        app_name="ann_probe",
        shuffle_partitions=sized_shuffle_partitions(sf_dir),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(
                sized_max_partition_bytes(sf_dir)
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    en = corpus(spark, sf_dir)
    n_corpus = en.count()
    for n in probe_counts:
        row = {
            "corpus": n_corpus,
            "probes": n,
            "brute_pairs": n * (n_corpus - 1),
            # candidate pairs the LSH plan actually scores — the quantity
            # the bucket join exists to shrink
            "lsh_pairs": lsh_scored(en, n).count(),
            "brute_spark": timed_noop(brute_topk(en, n)),
            "lsh_spark": timed_noop(lsh_topk(en, n)),
            "ivf_spark": timed_noop(ivf_topk(spark, sf_dir, n)),
        }
        print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
