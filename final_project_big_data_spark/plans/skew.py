"""Skew-resilient join rewrite (salting).

AQE's skew-join handles moderate skew by splitting oversized *partitions*,
but a single hot KEY (one key = 30% of a 100 TB fact table) still lands in
one task on the build of that key's partition. Salting fixes the key space
itself: the probe side's hot rows scatter across ``n_salts`` sub-keys and
the build side replicates ``n_salts``× — turning one straggler task into
``n_salts`` even ones at the cost of replicating the (small) build side.

Use when: equi-join, one side small enough to replicate (dim side), heavy
hitters known or suspected on the fact side. Don't use for fact×fact joins
(replication cost explodes) — bucket or AQE those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim ON on`` with the key space salted ``n_salts``
    ways. Result is identical to ``fact.join(dim, on, how)``; only the
    physical key distribution changes.

    The fact side's salt is a deterministic hash of the whole row (stable
    across retries — required for exactly-once sinks); the dim side
    explodes to all salts.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (dim side replicated)")
    fact_s = fact.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    dim_s = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = fact_s.join(dim_s, on=[on, _SALT], how=how)
    return joined.drop(_SALT)
