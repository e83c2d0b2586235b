#!/usr/bin/env python
"""IVF assign-stage A/B: interpreted HOF argmax vs Arrow/NumPy (VERDICT r6 #3).

The 1000× sweep measured ~3.5M interpreted dots/s in the IVF
train/assign map stage (s03/d10): ``array_max(transform(carr, ...))``
with the ``aggregate(zip_with(...))`` dot evaluates per-element in the
HOF interpreter. This probe A/Bs that stage in isolation against two
Arrow-batched NumPy formulations, on the SAME materialized centroids:

- ``hof``      — the shipping shape (`_centroid_argmax`): per-row argmax
  over the broadcast collected-centroid array, JVM HOF interpreter.
- ``np_fold``  — pandas_udf; affinity matrix accumulated dim-by-dim
  (``S += V[:, i:i+1] * C[None, :, i]``), which reproduces the HOF
  fold's left-to-right per-(row, centroid) summation order EXACTLY →
  bit parity expected.
- ``np_blas``  — pandas_udf; one BLAS GEMM (``V @ C.T``). Fastest, but
  pairwise/AVX summation order differs from the fold → argmax parity is
  MEASURED, not assumed.

All three receive identical centroids (one eager collect, outside all
timings — probe-only; registry builders stay lazy). Ties break to the
larger centroid_id in every variant (array_max struct semantics).

Usage:  python tools/ivf_vec_probe.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_probe_x100"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from final_project_big_data_spark.queries.similarity import (
        _centroid_argmax,
        _ivf_assigned,
    )
    from final_project_big_data_spark.session import (
        get_spark,
        sized_adaptive_enabled,
        sized_driver_memory,
        sized_max_partition_bytes,
        sized_shuffle_partitions,
    )

    spark = get_spark(
        app_name="ivf_vec_probe",
        shuffle_partitions=sized_shuffle_partitions(sf),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(
                sized_max_partition_bytes(sf)
            ),
            "spark.sql.adaptive.enabled": str(
                sized_adaptive_enabled(sf)
            ).lower(),
            "spark.driver.memory": sized_driver_memory(sf),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    en, cents, _assigned, _kdf = _ivf_assigned(spark, sf)
    # one eager materialization shared by every variant (outside timings)
    cent_rows = sorted(cents.collect(), key=lambda r: r.centroid_id)
    k = len(cent_rows)
    C = np.array([r.cv for r in cent_rows], dtype=np.float64)  # k x dim
    NC = np.array([r.nc for r in cent_rows], dtype=np.float64)
    IDS = np.array([r.centroid_id for r in cent_rows], dtype=np.int64)
    cents_df = spark.createDataFrame(cent_rows, schema=cents.schema)
    dim = C.shape[1]

    def _np_assign(use_blas: bool):
        @pandas_udf("long")
        def assign(v: pd.Series, nv: pd.Series) -> pd.Series:
            V = np.stack(v.to_numpy())  # n x dim
            if use_blas:
                S = V @ C.T
            else:
                S = np.zeros((V.shape[0], k))
                for i in range(dim):  # left fold over dims == HOF order
                    S += V[:, i : i + 1] * C[None, :, i]
            aff = S / (nv.to_numpy()[:, None] * NC[None, :])
            # argmax with ties -> larger centroid_id (array_max struct
            # semantics); IDS is ascending, so take the LAST max index
            rev = aff[:, ::-1]
            idx = aff.shape[1] - 1 - np.argmax(rev, axis=1)
            return pd.Series(IDS[idx])

        return en.select("vec_id", assign("v", "nv").alias("centroid_id"))

    def _hof():
        carr, best_cid = _centroid_argmax(cents_df)
        return en.crossJoin(F.broadcast(carr)).select(
            "vec_id", best_cid.alias("centroid_id")
        )

    variants = {
        "hof": _hof,
        "np_fold": lambda: _np_assign(False),
        "np_blas": lambda: _np_assign(True),
    }
    out = {"sf_dir": sf, "k": k, "n": en.count(), "runs": runs}
    for name, mk in variants.items():
        best = float("inf")
        for _ in range(runs):
            df = mk()
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_s"] = round(best, 3)
    # parity: exact assignment diffs vs the shipping HOF shape
    base = _hof()
    for name in ("np_fold", "np_blas"):
        other = variants[name]()
        diffs = (
            base.alias("a")
            .join(other.alias("b"), "vec_id")
            .filter(F.col("a.centroid_id") != F.col("b.centroid_id"))
            .count()
        )
        out[f"{name}_assign_diffs"] = diffs
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
