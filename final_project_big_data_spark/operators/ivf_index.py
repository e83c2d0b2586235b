"""IVF index persistence — the "trained centers persist" posture made
executable.

s03 trains its IVF coarse quantizer lazily inside the query (required:
registry builders must run no jobs at build time), which re-pays the
train+assign cost every execution. SCALE.md's measured ANN crossover
argues IVF wins "wherever the trained centroids persist"; this module
is that deployment shape: build once, write the index as plain parquet
(centroids + inverted-list postings + the 1-row k metadata), query
forever. The query path is byte-identical to s03's — both call
``queries.similarity._ivf_probe`` — so a persisted-index query returns
EXACTLY the fresh-build result (pinned by
``tests/test_similarity.py::test_persisted_ivf_index_matches_fresh``).

At 100 TB the index lives beside the corpus on object storage: postings
are partitioned by ``centroid_id`` so a query's nprobe inverted lists
prune to nprobe directories at the SCAN (partition pruning — no full
postings read), and the ≤k-row centroid table broadcasts. Rebuilds are
a scheduled maintenance job (this module's ``save``), not query-time
work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def save_ivf_index(spark: SparkSession, sf: str, path: str) -> None:
    """Train the IVF quantizer on ``sf``'s embeddings (the same seeded
    init + one Lloyd pass as s03) and persist the three index frames."""
    from final_project_big_data_spark.queries.similarity import _ivf_assigned

    _, cents, assigned, kdf = _ivf_assigned(spark, sf)
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    (
        assigned.select("vec_id", "v", "nv", "centroid_id")
        # co-locate each inverted list before the partitioned write: without
        # this, every one of the ~32 writer tasks drops a file into every
        # centroid directory (k×tasks small files — measured 5× slower
        # QUERIES from listing alone); with it, one file per list
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(path, "postings"))
    )
    kdf.write.mode("overwrite").parquet(os.path.join(path, "meta"))


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(centroids, postings, meta) back as DataFrames; postings scans
    prune to the probed centroid_id partitions."""
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    assigned = spark.read.parquet(os.path.join(path, "postings"))
    kdf = spark.read.parquet(os.path.join(path, "meta"))
    return cents, assigned, kdf


def ivf_topk_with_index(
    spark: SparkSession, path: str, n_queries: int
) -> DataFrame:
    """ANN top-k for the first ``n_queries`` corpus vectors against a
    persisted index — s03's exact query plan over loaded frames. The
    probe vectors come out of the postings themselves (they carry v/nv),
    so no corpus rescan happens at query time."""
    from final_project_big_data_spark.queries.similarity import _ivf_probe

    cents, assigned, kdf = load_ivf_index(spark, path)
    probes_en = assigned.filter(F.col("vec_id") < n_queries).select(
        "vec_id", "v", "nv"
    )
    return _ivf_probe(probes_en, cents, assigned, kdf)
