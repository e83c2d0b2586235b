"""Deduplication operators for an LLM training-data pipeline (SURVEY C20+).

Families over ``documents`` / ``embeddings``:

- exact (hash-groupBy), Bloom-filter (d08), chunk-level (d09), and
  content-defined chunking (d14: rolling-hash boundaries, insertion-stable)
- MinHash + LSH banding (shingle → md5 minhash → band keys → bucket join)
- SimHash (per-bit majority over md5-derived 32-bit word hashes)
- n-gram Jaccard (blocked pairs, d05), prefix-filter Jaccard (d11),
  and asymmetric containment via the inverted-index overlap join (d15)
- edit-distance pairs (d12: banded levenshtein over the same blocking)
- embedding-cosine near-dup (d06) and SemDeDup on IVF clusters (d10)
- duplicate clusters via connected components (d07), applied to the
  corpus by d13 (one canonical survivor per cluster)

Everything is built-in-function Spark (no Python in the hot path beyond
the size-switched Arrow pair kernel), and every query here is *fully*
oracle-checked: both engines compute the identical md5-based hashes, so
even MinHash/SimHash hash-match DuckDB.

Scale posture (100 TB): no O(n²) anywhere global — pair generation is
always blocked (LSH band key, (lang, size-bucket), label, centroid),
i.e. an equi-join that shuffles on the block key — and since round 9
the block KNOBS are data-derived, identically in the oracles: d03's
bands/rows come from corpus count (r=1 <1k docs, 2 <1M, 4 beyond —
bucket load ≈ n·j_bg^r needs r growing with n), and d05/d12's length
bucket width w = max(1, ceil(32·range/n)) keeps expected blocks ~32
docs at any volume (adjacent-bucket emission preserves boundary
recall). Planted-duplicate recall is pinned at two volumes in
tests/test_dedup.py; the r=4 regime is oracle-checked at 1.25M docs
(tools/lsh_knob_probe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.operators.vector import dot_fold
from final_project_big_data_spark.plans.parallelism import widen
from final_project_big_data_spark.queries import query

_N_MINHASH = 8  # permutations, implemented as affine re-hashes of one md5


def _words(col: str = "text"):
    return F.split(F.trim(F.col(col)), r"\s+")


@query(
    "d01_exact_dedup",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies, md5(text) AS fp
    FROM documents GROUP BY text ORDER BY doc_id
    """,
    category="dedup",
)
def d01(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep min doc_id per group.

    One shuffle on the (hashed) text; at scale group by md5(text) instead of
    raw text to keep shuffle rows narrow — shown here via the fp column.
    """
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies", F.md5("text").alias("fp"))
        .orderBy("doc_id")
    )


_MH_P = 1073741789  # prime < 2^30: products stay < 2^60, no int64 overflow
_MH_COEF = [
    (1, 0),
    (976369, 1982627),
    (515187, 875917),
    (740041, 303821),
    (628361, 118273),
    (440817, 711679),
    (904243, 55511),
    (228887, 992161),
]


def _base_hash():
    """One 60-bit integer hash per shingle (md5 prefix)."""
    return F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast(
        "long"
    )


def _minhash_exprs() -> list:
    """k seeded minhashes via ONE base hash + k affine permutations
    ``(aᵢ·h + bᵢ) mod P`` (universal hashing).

    Two deliberate choices for the hot path:
    - integers, not hex strings: ``min(string)`` needs a var-length agg
      buffer → SortAggregate fallback; ``min(long)`` stays in HashAggregate
      and shuffles 8 bytes/hash;
    - one md5 per shingle, not k: the permutation family is integer
      arithmetic, k× cheaper than k independent digests, with P < 2³⁰ so
      ``a·h`` fits int64 in both engines (DuckDB raises on overflow).
    """
    h = _base_hash() % _MH_P
    return [
        F.min((F.lit(a) * h + F.lit(b)) % _MH_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(_MH_COEF)
    ]


def _shingled(spark: SparkSession, sf: str) -> DataFrame:
    """documents → (doc_id, shingle) with 2-word shingles, distinct.

    Docs with < 2 words are filtered out BEFORE the transform: Spark's
    ``sequence(1, 0)`` is a DESCENDING [1, 0] (unlike DuckDB's empty
    ``generate_series(1, 0)``), so a 1-word doc would evaluate
    ``element_at(w, 2)`` and abort the whole job — a real-corpus crash
    the shingle-complete sf fixtures never exercised (found by the
    round-10 short-doc pin, tests/test_round10_ops.py).
    """
    d = (
        widen(load_table(spark, sf, "documents"))
        .select("doc_id", _words().alias("w"))
        .filter(F.size("w") >= 2)
    )
    shingles = F.expr(
        "transform(sequence(1, size(w) - 1),"
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
    )
    # array_distinct is per-doc, so no extra (shuffling) distinct() is needed.
    return d.select(
        "doc_id", F.explode(F.array_distinct(shingles)).alias("shingle")
    )


_SHINGLE_SQL = """
      SELECT doc_id, unnest(list_distinct(
               list_transform(generate_series(1, len(w) - 1),
                              i -> w[i] || ' ' || w[i + 1]))) AS shingle
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
            FROM documents)
"""

def _minhash_sql_cols() -> str:
    return ",\n             ".join(
        f"min(({a} * h + {b}) % {_MH_P}) AS mh{i}"
        for i, (a, b) in enumerate(_MH_COEF)
    )


_MINHASH_SQL = f"""
    WITH sh AS ({_SHINGLE_SQL}),
    hh AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {_MH_P} AS h
      FROM sh
    ),
    mh AS (
      SELECT doc_id,
             {_minhash_sql_cols()}
      FROM hh GROUP BY doc_id
    )
"""


@query(
    "d02_minhash_signatures",
    oracle=_MINHASH_SQL
    + "SELECT doc_id, "
    + ", ".join(f"mh{i}" for i in range(_N_MINHASH))
    + " FROM mh ORDER BY doc_id",
    category="dedup",
)
def d02(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash signatures: 2-word shingles → k seeded md5 minima per doc."""
    return (
        _shingled(spark, sf)
        .groupBy("doc_id")
        .agg(*_minhash_exprs())
        .orderBy("doc_id")
    )


MAX_LSH_BUCKET = 1024  # degenerate-band guard; fixture buckets are ≤ ~50


def lsh_candidate_pairs(
    mh: DataFrame, band_col: str, max_bucket: int = MAX_LSH_BUCKET
) -> DataFrame:
    """Banded candidate-pair expansion with a degenerate-bucket cap.

    Deliberately NOT a self-join: a self-join evaluates the signature
    subplan twice (Spark can't reuse it across a broadcast and a stream
    side). Signatures shuffle ONCE on the band key; a band-partitioned
    window counts each bucket, rows in buckets outside [2, max_bucket]
    are dropped, and only then does ``collect_list`` materialize a
    bucket's ids — so a pathological band (a boilerplate shingle shared
    by millions of docs) never builds a giant array or an O(bucket²)
    expansion in one task. The groupBy after the window reuses the same
    hash partitioning: still exactly one exchange. A bucket over the cap
    is a degenerate band, not a dup cluster — dropping it loses no real
    candidates (those pairs recur in other bands; add bands for recall).
    """
    from pyspark.sql import Window as W

    wb = W.partitionBy(band_col)
    kept = mh.withColumn("_bsz", F.count(F.lit(1)).over(wb)).filter(
        (F.col("_bsz") >= 2) & (F.col("_bsz") <= max_bucket)
    )
    buckets = kept.groupBy(band_col).agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) ->"
        " transform(slice(ids, i + 2, size(ids) - i - 1),"
        " y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return (
        buckets.select(
            F.col(band_col).alias("band_key"), F.explode(pair_expr).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "band_key")
    )


def _lsh_r_case_sql() -> str:
    """The band-width knob, as the SAME integer CASE both engines run."""
    return (
        "CASE WHEN count(*) < 1000 THEN 1 "
        "WHEN count(*) < 1000000 THEN 2 ELSE 4 END"
    )


_SIG_COLS = ", ".join(f"mh{i}" for i in range(_N_MINHASH))


@query(
    "d03_minhash_lsh_pairs",
    oracle=_MINHASH_SQL
    + f""",
    knob AS (SELECT {_lsh_r_case_sql()} AS r FROM documents),
    sigs AS (SELECT doc_id, [{_SIG_COLS}] AS sig FROM mh),
    banded AS (
      SELECT doc_id, CAST(j AS INT) AS band_id,
             array_to_string(
               list_transform(sig[CAST(j * r + 1 AS INT):CAST(j * r + r AS INT)],
                              x -> CAST(x AS VARCHAR)), ',') AS bkey
      FROM sigs, knob, generate_series(0, {_N_MINHASH - 1}) AS g(j)
      WHERE j < {_N_MINHASH} // r
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.bkey = b.bkey
           AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(count(*) AS INT) AS n_bands
    FROM cand GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b
    """,
    category="dedup",
)
def d03(spark: SparkSession, sf: str) -> DataFrame:
    """LSH banding with DATA-DERIVED band structure (round 9, VERDICT r8
    #2): the signature's 8 minhashes split into b = 8/r bands
    of r rows, where r comes from the corpus row count via a broadcast
    1-row knob join (the same derived-knob posture as the IVF family's
    k = ⌈√n⌉): r=1 under 1k docs, r=2 under 1M, r=4 beyond. Rationale:
    two UNRELATED docs collide on an r-row band with probability
    ≈ j_bg^r (j_bg = background shingle-set Jaccard), so expected bucket
    load per doc is n·j_bg^r — a FIXED r that is fine at 60k docs is
    quadratic blowup at 10⁹; growing r with n keeps bucket loads
    bounded, while b = 8/r bands keep near-dup recall ≥ 1-(1-j^r)^b
    (j=0.9, r=4, b=2 → 0.88; r=2, b=4 → 0.999). Pinned at two volumes
    by tests/test_dedup.py::test_lsh_planted_duplicate_recall.

    Candidate generation stays O(pairs-in-bucket), never O(n²): per
    band, buckets above ``MAX_LSH_BUCKET`` are dropped before any array
    materializes (see ``lsh_candidate_pairs``); a pair colliding in
    several bands is collapsed by the final groupBy, whose n_bands count
    is the agreement strength (a free LSH-similarity estimate).
    """
    d = load_table(spark, sf, "documents")
    knob = d.groupBy().count().select(
        F.when(F.col("count") < 1000, 1)
        .when(F.col("count") < 1000000, 2)
        .otherwise(4)
        .alias("r")
    )
    mh = _shingled(spark, sf).groupBy("doc_id").agg(*_minhash_exprs())
    sig = F.array(*[F.col(f"mh{i}") for i in range(_N_MINHASH)])
    banded = (
        mh.select("doc_id", sig.alias("sig"))
        .crossJoin(F.broadcast(knob))  # 1-row knob: lazy, no driver count
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, int({_N_MINHASH} / r) - 1),"
                    " j -> concat(cast(j AS string), ':',"
                    "  array_join(transform(slice(sig, j * r + 1, r),"
                    "             x -> cast(x AS string)), ',')))"
                )
            ).alias("band"),
        )
    )
    return (
        lsh_candidate_pairs(banded, "band")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_bands"))
        .orderBy("doc_a", "doc_b")
    )


_SIMHASH_BITS = 32


def _simhash_df(spark: SparkSession, sf: str) -> DataFrame:
    """32-bit SimHash: per-bit majority vote over md5-derived word hashes."""
    d = widen(load_table(spark, sf, "documents")).select(
        "doc_id", "lang", "n_chars", _words().alias("w")
    )
    exploded = d.select(
        "doc_id",
        F.explode("w").alias("word"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
    )
    bit_sums = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    simhash = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = term if simhash is None else simhash + term
    return bit_sums.select("doc_id", simhash.alias("simhash"))


def _simhash_sql() -> str:
    bit_sums = ",\n             ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(_SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    return f"""
    WITH ex AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(unnest(string_split_regex(trim(text), '\\s+'))), 1, 8)
                  AS BIGINT) AS h
      FROM documents
    ),
    bits AS (
      SELECT doc_id,
             {bit_sums}
      FROM ex GROUP BY doc_id
    )
    SELECT doc_id, {combine} AS simhash FROM bits ORDER BY doc_id
    """


@query("d04_simhash", oracle=_simhash_sql(), category="dedup")
def d04(spark: SparkSession, sf: str) -> DataFrame:
    return _simhash_df(spark, sf).orderBy("doc_id")


@query(
    "d05_ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    knob AS (
      SELECT GREATEST(1, (32 * (max(n_chars) - min(n_chars) + 1)
                          + count(*) - 1) // count(*)) AS w
      FROM documents
    ),
    docsets AS (
      SELECT s.doc_id, d.lang, d.n_chars // k.w AS bucket,
             list_sort(list(s.shingle)) AS shset
      FROM sh s JOIN documents d ON s.doc_id = d.doc_id, knob k
      GROUP BY s.doc_id, d.lang, d.n_chars // k.w
    ),
    cand AS (
      SELECT doc_id, lang, bucket, shset,
             unnest([bucket, bucket + 1]) AS block
      FROM docsets
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shset, b.shset)) * 1.0
                 / len(list_distinct(list_concat(a.shset, b.shset))), 4) AS jaccard
    FROM cand a JOIN cand b
      ON a.lang = b.lang AND a.block = b.block AND a.doc_id < b.doc_id
         AND a.block = GREATEST(a.bucket, b.bucket)
    WHERE len(list_intersect(a.shset, b.shset)) * 1.0
          / len(list_distinct(list_concat(a.shset, b.shset))) >= 0.01
    ORDER BY doc_a, doc_b
    """,
    category="dedup",
)
def d05(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram Jaccard near-dup: blocked pairs → shingle-set overlap.

    Round 9 (VERDICT r8 #2): the length-bucket width is DATA-DERIVED —
    ``w = max(1, ceil(32 · length_range / n))`` from a broadcast 1-row
    knob (pure int64 arithmetic, identical in the oracle), so the
    expected block size stays ~32 docs at ANY corpus size: a FIXED
    width means blocks grow ∝ n and within-block pair work ∝ n² — the
    fixed-knob quadratic lesson (SURVEY §7.4) applied to blocking.
    Boundary recall: each doc is emitted into its own bucket AND the
    next (still an equi-join), with ``block = greatest(bucket_a,
    bucket_b)`` collapsing the double-match, so two near-dups straddling
    a bucket edge are no longer silently missed — pinned by
    tests/test_dedup.py::test_jaccard_planted_duplicate_recall.

    The 0.01 threshold marks "shares ≥ 2 shingles" on this synthetic
    corpus.
    """
    sh = _shingled(spark, sf)
    docs = load_table(spark, sf, "documents")
    knob = docs.agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("n_chars") - F.min("n_chars") + 1).alias("rng"),
    ).select(
        F.greatest(
            F.lit(1).cast("long"), F.expr("(32 * rng + n - 1) div n")
        ).alias("w")
    )
    d = (
        docs.crossJoin(F.broadcast(knob))  # 1-row knob: lazy, no count()
        .select("doc_id", "lang", F.expr("n_chars div w").alias("bucket"))
    )
    docsets = (
        sh.join(d, "doc_id")
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.sort_array(F.collect_list("shingle")).alias("shset"))
    )
    # two-key emission: a doc lands in its bucket and the next, so pairs
    # one apart still meet on an EQUI key; greatest() dedupes same-bucket
    # pairs that would otherwise match twice
    cand = docsets.withColumn(
        "block", F.explode(F.array(F.col("bucket"), F.col("bucket") + 1))
    )
    # same compute-bound widening as d12 (the set intersections run in
    # the join stage): pre-partition on the join keys at core count —
    # shared partitioning, no extra exchange (3.7 s → 2.1 s at 5k docs)
    cand = cand.repartition(
        spark.sparkContext.defaultParallelism, "lang", "block"
    )
    a = cand.alias("a")
    b = cand.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shset"), F.col("b.shset")))
    union = F.size(F.array_union(F.col("a.shset"), F.col("b.shset")))
    jac = inter * 1.0 / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.col("a.block")
                == F.greatest(F.col("a.bucket"), F.col("b.bucket"))
            ),
        )
        .where(jac >= 0.01)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "d06_embedding_near_dup",
    oracle="""
    WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    e AS (
      SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nv
      FROM e0 WHERE sqrt(list_dot_product(v, v)) > 0
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v) / (a.nv * b.nv), 4) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nv * b.nv) >= 0.3
    ORDER BY vec_a, vec_b
    """,
    category="dedup",
)
def d06(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup: label-blocked pairs above cosine 0.3.

    Dot products run element-sequential in both engines (identical fp
    order), so results hash-match exactly after round(·, 4).
    """
    from final_project_big_data_spark.operators.vector import (
        block_pair_cosine,
        pair_kernel,
    )

    dot = dot_fold  # shared sequential fold (see operators/vector.py)

    # norms once per row, not per pair (HOFs are interpreted — 3× cheaper)
    e = widen(load_table(spark, sf, "embeddings")).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # zero-norm vectors never pair (engine contract — ANSI mode would
    # abort the divide; same WHERE nv > 0 guard in the oracle)
    e = e.withColumn("nv", F.sqrt(dot(F.col("v"), F.col("v")))).filter(
        F.col("nv") > 0
    )
    if pair_kernel(sf) == "np":
        # round-8 vectorized pair stage (operators/vector.py): identical
        # floats/fold order to the join shape, bit parity by construction
        pairs = block_pair_cosine(e, "label", mode="lt", tau=0.3)
    else:
        a = e.alias("a")
        b = e.alias("b")
        cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv"))
        pairs = (
            a.join(
                b,
                (F.col("a.label") == F.col("b.label"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .where(cos >= 0.3)
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                cos.alias("cs"),
            )
        )
    return pairs.select(
        F.col("id_a").alias("vec_a"),
        F.col("id_b").alias("vec_b"),
        F.round("cs", 4).alias("cos_sim"),
    ).orderBy("vec_a", "vec_b")


# Shared CTE chain for the cluster family (d07, d13): mh0-blocked pairs →
# recursive reachability → min-label clusters.
_CLUSTERS_SQL = (
    _MINHASH_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
    pairs AS (
      SELECT a.doc_id AS pa, b.doc_id AS pb
      FROM mh a JOIN mh b ON a.mh0 = b.mh0 AND a.doc_id < b.doc_id
    ),
    edges AS (SELECT pa, pb FROM pairs UNION SELECT pb, pa FROM pairs),
    reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM mh
      UNION
      SELECT e.pb, reach.r FROM reach JOIN edges e ON e.pa = reach.doc_id
    ),
    clusters AS (
      SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
    )
"""
)


def _mh0_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, cluster_id) via mh0-blocked pairs + connected components —
    the Spark twin of ``_CLUSTERS_SQL``, shared by d07 and d13."""
    from final_project_big_data_spark.operators.components import (
        connected_components,
    )

    mh = _shingled(spark, sf).groupBy("doc_id").agg(*_minhash_exprs())
    pairs = (
        mh.groupBy("mh0")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    nodes = mh.select("doc_id")
    cc = connected_components(nodes, pairs, id_col="doc_id")
    return cc.select(F.col("id").alias("doc_id"), "cluster_id")


@query(
    "d07_dup_clusters",
    oracle=_CLUSTERS_SQL
    + "SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id",
    category="dedup",
)
def d07(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup clustering: LSH candidate pairs → connected components →
    canonical (min) doc_id per cluster.

    The step that turns pairwise candidates into an actual dedup decision;
    iterative min-label propagation (operators/components.py) against a
    DuckDB recursive-CTE reachability oracle.
    """
    return _mh0_clusters(spark, sf).orderBy("doc_id")


@query(
    "d13_dedup_apply",
    oracle=_CLUSTERS_SQL
    + """,
    all_clusters AS (
      SELECT doc_id, cluster_id FROM clusters
      UNION ALL
      SELECT doc_id, doc_id AS cluster_id
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
            FROM documents)
      WHERE len(w) < 2
    )
    SELECT c.cluster_id AS doc_id, d.source, d.n_chars,
           CAST(count(*) AS BIGINT) AS n_merged
    FROM all_clusters c JOIN documents d ON d.doc_id = c.cluster_id
    GROUP BY c.cluster_id, d.source, d.n_chars
    ORDER BY doc_id
    """,
    category="dedup",
)
def d13(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end dedup APPLIED: the surviving corpus after near-dup
    clustering — one canonical (min-id) document per cluster, annotated
    with how many members it absorbed.

    d01–d12 produce signatures, candidate pairs, and cluster labels; this
    is the operation a pipeline user actually runs before training —
    "give me the deduplicated corpus". Cluster sizes come from one
    hash-agg on the d07 labels; the canonical rows come back from
    ``documents`` via an equi-join on the cluster id (survivors are a
    subset of docs, so the join is corpus-sized, never larger). Same
    recursive-CTE oracle as d07 extended by the survivor join, so the
    whole pipeline — shingle → minhash → block → components → apply —
    stays value-hash-checked.

    Documents with fewer than 2 words produce no shingles, so they never
    enter the minhash/cluster graph — they are unioned back as singleton
    survivors (cluster_id = own doc_id) in BOTH builder and oracle, so
    the conservation property sum(n_merged) == corpus rows holds for ANY
    corpus, not just shingle-complete fixtures (ADVICE r9; pinned in
    tests/test_round10_ops.py with a short-doc corpus).
    """
    cc = _mh0_clusters(spark, sf)
    singletons = (
        widen(load_table(spark, sf, "documents"))
        .select("doc_id", _words().alias("w"))
        .filter(F.size("w") < 2)
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    cc = cc.unionByName(singletons)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("n_merged"))
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return (
        sizes.join(docs, sizes.cluster_id == docs.doc_id)
        .select("doc_id", "source", "n_chars", "n_merged")
        .orderBy("doc_id")
    )


# --------------------------------------------------------- bloom-filter dedup

_BLOOM_M = 16384  # bits; filter table is bounded by m regardless of corpus
_BLOOM_K = 3  # hash functions = 3 disjoint md5 hex windows


def _bloom_positions():
    """k bit positions per document fingerprint: three disjoint 8-hex-char
    (32-bit) windows of one md5, each mod m. One digest, k positions —
    same cost discipline as the MinHash base hash."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5("text"), 1 + 8 * j, 8), 16, 10
                ).cast("long")
                % _BLOOM_M
            )
            for j in range(_BLOOM_K)
        ]
    )


_BLOOM_POS_SQL = ", ".join(
    f"CAST('0x' || substr(md5(text), {1 + 8 * j}, 8) AS BIGINT) % {_BLOOM_M}"
    for j in range(_BLOOM_K)
)


@query(
    "d08_bloom_filter_dedup",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source, [{_BLOOM_POS_SQL}] AS ps FROM documents
    ),
    ref AS (
      SELECT DISTINCT unnest(ps) AS pos FROM fp WHERE len(source) = 4
    ),
    probe AS (
      SELECT doc_id, unnest(ps) AS pos FROM fp WHERE len(source) > 4
    )
    SELECT probe.doc_id,
           count(ref.pos) = {_BLOOM_K} AS might_dup
    FROM probe LEFT JOIN ref ON probe.pos = ref.pos
    GROUP BY probe.doc_id ORDER BY probe.doc_id
    """,
    category="dedup",
)
def d08(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter incremental dedup: screen an incoming batch against an
    already-ingested corpus without joining on full fingerprints.

    The "filter" is the relational form of a Bloom bitmap: the DISTINCT set
    of set bit positions, at most m = {m} rows — **bounded by m, not by
    corpus size**, so it broadcasts at any scale (a 100-TB reference corpus
    still compresses to ≤ m longs). Probes explode to (doc_id, pos) and
    broadcast-join the position set; a doc is ``might_dup`` iff all k of
    its positions are set (count == k), the standard no-false-negative /
    tunable-false-positive Bloom semantics. No shuffle touches the
    reference corpus after the one distinct-positions aggregation.

    Reference half = sources 'src0'..'src9' (name length 4); probe half =
    'src10'..'src19'. Fully oracle-checked: both engines derive positions
    from the same md5 windows.
    """
    fp = load_table(spark, sf, "documents").select(
        "doc_id", "source", _bloom_positions().alias("ps")
    )
    ref = (
        fp.filter(F.length("source") == 4)
        .select(F.explode("ps").alias("pos"))
        .distinct()
    )
    probe = fp.filter(F.length("source") > 4).select(
        "doc_id", F.explode("ps").alias("pos")
    )
    return (
        probe.join(F.broadcast(ref.withColumn("_set", F.lit(1))), "pos", "left")
        .groupBy("doc_id")
        .agg((F.count("_set") == _BLOOM_K).alias("might_dup"))
        .orderBy("doc_id")
    )


d08.__doc__ = d08.__doc__.format(m=_BLOOM_M)


# ------------------------------------------------------ passage-level dedup

_CHUNK_WORDS = 8  # non-overlapping passage width, in words


@query(
    "d09_chunk_dedup",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(0, CAST(len(w) // {_CHUNK_WORDS} AS INT) - 1),
               i -> array_to_string(
                      w[{_CHUNK_WORDS}*i + 1 : {_CHUNK_WORDS}*(i + 1)], ' ')
             )) AS chunk
      FROM w
    ),
    cnt AS (
      SELECT doc_id, count(*) OVER (PARTITION BY chunk) AS freq FROM ch
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           -- CAST: DuckDB SUM(int) is HUGEINT, which pandas renders as
           -- float64 — hash-drift vs Spark's bigint (driver-mimic finding)
           CAST(sum(CASE WHEN freq >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_chunks,
           ROUND(sum(CASE WHEN freq >= 2 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS dup_ratio
    FROM cnt GROUP BY doc_id ORDER BY doc_id
    """,
    category="dedup",
)
def d09(spark: SparkSession, sf: str) -> DataFrame:
    """Passage-level exact dedup: split every document into non-overlapping
    {cw}-word chunks and score each document by the fraction of its chunks
    that occur anywhere else in the corpus (the sequence-level dedup signal
    used to strip boilerplate/templated spans from LLM training corpora).

    Plan: one explode (docs → chunks), ONE shuffle on the chunk text for a
    chunk-partitioned count window, then the per-doc re-aggregation —
    Catalyst reuses nothing across stages wider than needed, and no
    all-pairs comparison exists at any point. At 100 TB the chunk shuffle
    key should be md5(chunk) (8-byte prefix) rather than raw text; raw
    text is kept here so the fixture oracle stays byte-identical.
    """
    d = widen(load_table(spark, sf, "documents")).select(
        "doc_id", _words().alias("w")
    )
    n_chunks = (F.size("w") / _CHUNK_WORDS).cast("int")
    chunk_expr = F.expr(
        f"transform(sequence(1, size(w) div {_CHUNK_WORDS}),"
        f" i -> array_join(slice(w, {_CHUNK_WORDS} * (i - 1) + 1,"
        f" {_CHUNK_WORDS}), ' '))"
    )
    from pyspark.sql import Window as W

    chunks = d.filter(n_chunks >= 1).select(
        "doc_id", F.explode(chunk_expr).alias("chunk")
    )
    with_freq = chunks.withColumn(
        "freq", F.count(F.lit(1)).over(W.partitionBy("chunk"))
    )
    dup = F.sum((F.col("freq") >= 2).cast("long"))
    return (
        with_freq.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            dup.alias("n_dup_chunks"),
            F.round(dup / F.count("*"), 4).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


d09.__doc__ = d09.__doc__.format(cw=_CHUNK_WORDS)


@query(
    "x07_components_star",
    oracle=_MINHASH_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
    pairs AS (
      SELECT a.doc_id AS pa, b.doc_id AS pb
      FROM mh a JOIN mh b ON a.mh0 = b.mh0 AND a.doc_id < b.doc_id
    ),
    edges AS (SELECT pa, pb FROM pairs UNION SELECT pb, pa FROM pairs),
    reach(doc_id, r) AS (
      SELECT doc_id, doc_id FROM mh
      UNION
      SELECT e.pb, reach.r FROM reach JOIN edges e ON e.pa = reach.doc_id
    )
    SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
    ORDER BY doc_id
    """,
    category="dedup",
)
def x07(spark: SparkSession, sf: str) -> DataFrame:
    """d07's clustering recomputed with the large-star/small-star algorithm
    (``operators/components.connected_components_star``) — O(log n) rounds
    instead of O(diameter), the variant you switch to when dup chains run
    deep. Same LSH pairs, same recursive-CTE oracle as d07: the two
    implementations are cross-validated against the identical exact answer.
    """
    from final_project_big_data_spark.operators.components import (
        connected_components_star,
    )

    mh = _shingled(spark, sf).groupBy("doc_id").agg(*_minhash_exprs())
    pairs = (
        mh.groupBy("mh0")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids) - i - 1),"
                    " y -> struct(x AS a, y AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    nodes = mh.select("doc_id")
    cc = connected_components_star(nodes, pairs, id_col="doc_id")
    return cc.select(F.col("id").alias("doc_id"), "cluster_id").orderBy(
        "doc_id"
    )


_PPJ_T = 0.9  # Jaccard threshold for the prefix-filtered similarity join


@query(
    "d11_prefix_filter_jaccard",
    oracle=rf"""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS tok
      FROM documents
    ),
    freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    ranked AS (
      SELECT t.doc_id, t.tok,
             row_number() OVER (PARTITION BY t.doc_id
                                ORDER BY f.cnt, t.tok) AS rn,
             count(*) OVER (PARTITION BY t.doc_id) AS n
      FROM toks t JOIN freq f ON t.tok = f.tok
    ),
    prefix AS (SELECT * FROM ranked WHERE rn <= n - ceil({_PPJ_T} * n) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.n AS na, b.n AS nb
      FROM prefix a JOIN prefix b
        ON a.tok = b.tok AND a.doc_id < b.doc_id
      WHERE b.n >= {_PPJ_T} * a.n AND b.n <= a.n / {_PPJ_T}
    ),
    shared AS (
      SELECT c.da, c.db, c.na, c.nb, count(*) AS s
      FROM cand c
      JOIN toks x ON x.doc_id = c.da
      JOIN toks y ON y.doc_id = c.db AND y.tok = x.tok
      GROUP BY c.da, c.db, c.na, c.nb
    )
    SELECT da AS doc_id, CAST(count(*) AS BIGINT) AS n_similar_later,
           round(max(s * 1.0 / (na + nb - s)), 4) AS max_jaccard
    FROM shared WHERE s * 1.0 / (na + nb - s) >= {_PPJ_T}
    GROUP BY da ORDER BY doc_id
    """,
    category="dedup",
)
def d11(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix-filtered set-similarity self-join (PPJoin-style): exact
    word-set Jaccard ≥ t without comparing all pairs. Two filters from the
    similarity-join literature do the pruning BEFORE any pair
    materializes: (1) prefix filter — order each doc's tokens by
    ascending global frequency; two sets can reach Jaccard t only if
    their first ``n − ⌈t·n⌉ + 1`` rarest tokens intersect, so candidates
    come from an equi-join on PREFIX tokens only (rare tokens → tiny
    postings); (2) size filter — |smaller| ≥ t·|larger|. Survivors get
    exact verification via shared-token counts.

    This is the scale path d05's static (lang, size-bucket) blocking
    can't reach: blocking quality there depends on metadata, while the
    prefix bound is adaptive to the data's own frequency skew — the
    candidate set shrinks as the vocabulary grows (rarer prefixes),
    exactly the behavior wanted at 100 TB. Every stage is a keyed
    shuffle: token frequency (token), per-doc rank (doc), candidate
    generation (prefix token), verification (pair). Output is the
    per-doc summary (later-neighbor count + max Jaccard) so the result
    stays bounded by |docs| while the join itself is the full exact
    similarity join.

    Degenerate-vocabulary caveat: the win assumes a Zipfian vocabulary
    (real corpora), where prefix tokens are genuinely rare. On a
    template-generated corpus whose whole vocabulary is shared (this
    fixture), even the rarest token has long postings and candidate
    generation degrades toward blocked all-pairs — measured ~36 s at
    sf0.1 vs ~5 s at sf0.01. The production escape hatch for a hot
    prefix token is the d03 idiom: cap or sub-block postings above a
    bound (lossy) or fall back to minhash-LSH (d03) for the offending
    stratum; lossless exactness is kept here because the fixture sweep
    is the correctness gate.
    """
    d = widen(load_table(spark, sf, "documents"))
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias(
            "tok"
        ),
    ).distinct()
    freq = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    w_rank = W.partitionBy("doc_id").orderBy("cnt", "tok")
    w_n = W.partitionBy("doc_id")
    ranked = (
        toks.join(freq, "tok")
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count("*").over(w_n))
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n") - F.ceil(_PPJ_T * F.col("n")) + 1
    )
    a = prefix.select(
        F.col("doc_id").alias("da"), "tok", F.col("n").alias("na")
    )
    b = prefix.select(
        F.col("doc_id").alias("db"), "tok", F.col("n").alias("nb")
    )
    cand = (
        a.join(b, "tok")
        .filter(
            (F.col("da") < F.col("db"))
            & (F.col("nb") >= _PPJ_T * F.col("na"))
            & (F.col("nb") <= F.col("na") / _PPJ_T)
        )
        .select("da", "db", "na", "nb")
        .distinct()
    )
    x = toks.select(F.col("doc_id").alias("da"), "tok")
    y = toks.select(F.col("doc_id").alias("db"), "tok")
    shared = (
        cand.join(x, "da")
        .join(y, ["db", "tok"])
        .groupBy("da", "db", "na", "nb")
        .agg(F.count("*").alias("s"))
    )
    jac = F.col("s") * 1.0 / (F.col("na") + F.col("nb") - F.col("s"))
    return (
        shared.filter(jac >= _PPJ_T)
        .groupBy(F.col("da").alias("doc_id"))
        .agg(
            F.count("*").alias("n_similar_later"),
            F.round(F.max(jac), 4).alias("max_jaccard"),
        )
        .orderBy("doc_id")
    )


_EDIT_T = 80  # absolute edit-distance threshold (~5th pct of blocked pairs)


@query(
    "d12_edit_distance_pairs",
    oracle=f"""
    WITH knob AS (
      SELECT GREATEST(1, (32 * (max(n_chars) - min(n_chars) + 1)
                          + count(*) - 1) // count(*)) AS w
      FROM documents
    ),
    d AS (
      SELECT doc_id, lang, n_chars, text, n_chars // k.w AS bucket
      FROM documents, knob k
    ),
    cand AS (
      SELECT doc_id, lang, n_chars, text, bucket,
             unnest([bucket, bucket + 1]) AS block
      FROM d
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist
    FROM cand a JOIN cand b
      ON a.lang = b.lang AND a.block = b.block AND a.doc_id < b.doc_id
         AND a.block = GREATEST(a.bucket, b.bucket)
         AND abs(a.n_chars - b.n_chars) <= {_EDIT_T}
    WHERE levenshtein(a.text, b.text) <= {_EDIT_T}
    ORDER BY doc_a, doc_b
    """,
    category="dedup",
)
def d12(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance near-dup pairs: blocked candidates → BANDED
    levenshtein (round 9) — the character-level complement to d05's
    token-set Jaccard (catches shuffled-word or heavy-punctuation
    near-copies that shingles miss, and vice versa).

    Scale shape, three nested prunes so the O(len²) DP only ever runs
    on plausible pairs: (1) the d05 blocking scheme verbatim —
    data-derived bucket width ``w = max(1, ceil(32·range/n))`` keeps
    expected blocks ~32 docs at any corpus size, adjacent-bucket
    emission keeps boundary recall, the join stays an equi-join;
    (2) the length filter ``|len_a − len_b| ≤ T`` (a NECESSARY condition
    for distance ≤ T) cuts pairs before any text comparison;
    (3) Spark's threshold form ``levenshtein(a, b, T)`` runs the BANDED
    DP — O(len·T) instead of O(len²), returning -1 past T so distant
    pairs exit early. The oracle runs DuckDB's full levenshtein with
    the same predicates: identical surviving pairs, identical distances
    (values ≤ T are exact in both forms).

    Measured cost profile (round 9): ~24 s at 500 docs → ~65 s Spark /
    ~24 s DuckDB at 5,000 — LINEAR in corpus size at fixed block size
    (pairs ≈ 16·n), and the per-pair DP is identical work in both
    engines, so the 2.7× ratio is string-kernel constant, not a plan
    defect. This is the expensive member of the dedup family BY NATURE
    (character-level DP vs d03/d05's hash/set arithmetic); at 100 TB it
    runs as the final verification pass on LSH/Jaccard CANDIDATES, not
    as the primary sweep — which is exactly the composition its shared
    blocking scheme enables.
    """
    docs = load_table(spark, sf, "documents")
    knob = docs.agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("n_chars") - F.min("n_chars") + 1).alias("rng"),
    ).select(
        F.greatest(
            F.lit(1).cast("long"), F.expr("(32 * rng + n - 1) div n")
        ).alias("w")
    )
    d = docs.crossJoin(F.broadcast(knob)).select(
        "doc_id", "lang", "n_chars", "text",
        F.expr("n_chars div w").alias("bucket"),
    )
    cand = d.withColumn(
        "block", F.explode(F.array(F.col("bucket"), F.col("bucket") + 1))
    )
    # pre-partition on the JOIN KEYS at core count: the DP runs inside
    # the join stage, and a data-sized shuffle count (10 partitions for a
    # ~10 MB corpus) starves this COMPUTE-bound operator — both join
    # sides share the partitioning so no extra exchange is planned
    # (measured 65 s → 10 s at 5k docs on local[32])
    cand = cand.repartition(
        spark.sparkContext.defaultParallelism, "lang", "block"
    )
    a = cand.alias("a")
    b = cand.alias("b")
    dist = F.levenshtein(F.col("a.text"), F.col("b.text"), _EDIT_T)
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.col("a.block")
                == F.greatest(F.col("a.bucket"), F.col("b.bucket"))
            )
            & (
                F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= _EDIT_T
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") != -1)
        .orderBy("doc_a", "doc_b")
    )


# ----------------------------------------- content-defined chunking (CDC)

_CDC_DIV = 8  # boundary when the 2-word window hash % 8 == 0 → mean ≈ 8 words

_CDC_BOUNDARY = (
    "CAST(conv(substring(md5(concat(element_at(w, i - 1), ' ',"
    " element_at(w, i))), 1, 8), 16, 10) AS BIGINT)"
    f" % {_CDC_DIV} = 0"
)
# exclusive end offsets = starts shifted left, with size(w)+1 appended;
# materialized as its OWN column (``cdc_ends``) so the per-chunk lambda
# below does a plain element_at instead of rebuilding the shifted array
# per chunk — keeps extraction O(chunks), not O(chunks^2) (ADVICE r9)
_CDC_ENDS = (
    "concat(slice(cdc_starts, 2, size(cdc_starts) - 1),"
    " array(size(w) + 1))"
)
_CDC_CHUNKS = """
    transform(
      sequence(1, size(cdc_starts)),
      j -> array_join(
             slice(w, element_at(cdc_starts, j),
                   element_at(cdc_ends, j) - element_at(cdc_starts, j)),
             ' '))
"""


@query(
    "d14_cdc_chunks",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents
    ),
    st AS (
      SELECT doc_id, w,
             list_concat([1], list_filter(
               generate_series(2, len(w)),
               i -> CAST('0x' || substr(md5(w[i - 1] || ' ' || w[i]), 1, 8)
                         AS BIGINT) % {_CDC_DIV} = 0)) AS starts
      FROM w WHERE len(w) >= 2
    ),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(starts)),
               j -> array_to_string(
                      w[starts[j] :
                        list_concat(starts[2:], [len(w) + 1])[j] - 1], ' ')
             )) AS chunk
      FROM st
    ),
    cnt AS (
      SELECT doc_id, count(*) OVER (PARTITION BY chunk) AS freq FROM ch
    )
    SELECT doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN freq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           ROUND(sum(CASE WHEN freq >= 2 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 4) AS dup_ratio
    FROM cnt GROUP BY doc_id ORDER BY doc_id
    """,
    category="dedup",
)
def d14(spark: SparkSession, sf: str) -> DataFrame:
    """Content-defined chunking (CDC) dedup: chunk boundaries fall where a
    rolling 2-word window hash ≡ 0 (mod {div}), so boundaries are a pure
    function of LOCAL content — inserting or deleting words near the
    start of a document shifts d09's fixed-width chunk grid for the whole
    rest of the document, but CDC boundaries re-synchronize at the next
    hash-selected window and every later chunk fingerprint survives.
    That insertion stability is why storage dedup (LBFS/Venti lineage)
    and incremental-crawl corpus dedup chunk this way.

    Same output contract and plan shape as d09 (explode → ONE shuffle on
    chunk text for the corpus-wide frequency window → per-doc re-agg);
    the boundary selection itself is per-document array logic inside the
    scan projection — no extra shuffle. The md5-derived window hash makes
    DuckDB replay the exact boundary set, so chunking, frequencies, and
    ratios all hash-match.
    """
    d = widen(load_table(spark, sf, "documents")).select(
        "doc_id", _words().alias("w")
    )
    starts = F.expr(
        f"concat(array(1), filter(sequence(2, size(w)), i -> {_CDC_BOUNDARY}))"
    )
    chunks = (
        d.filter(F.size("w") >= 2)
        .withColumn("cdc_starts", starts)
        .withColumn("cdc_ends", F.expr(_CDC_ENDS))
        .select("doc_id", F.explode(F.expr(_CDC_CHUNKS)).alias("chunk"))
    )
    with_freq = chunks.withColumn(
        "freq", F.count(F.lit(1)).over(W.partitionBy("chunk"))
    )
    return (
        with_freq.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("freq") >= 2).cast("long")).alias("n_dup_chunks"),
            F.round(
                F.sum((F.col("freq") >= 2).cast("long"))
                / F.count("*").cast("double"),
                4,
            ).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


d14.__doc__ = d14.__doc__.format(div=_CDC_DIV)


# ------------------------------------------------- containment (overlap join)

_CONT_TAU = 0.5
_CONT_MAX_DF = 128  # df cap: a shingle in more docs is boilerplate by declaration


@query(
    "d15_containment_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLE_SQL}),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    kept AS (
      SELECT shingle FROM sh GROUP BY shingle
      HAVING count(*) BETWEEN 2 AND {_CONT_MAX_DF}
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sh a
      JOIN kept k ON a.shingle = k.shingle
      JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b, p.n_shared,
           ROUND(p.n_shared / CAST(least(sa.n, sb.n) AS DOUBLE), 4)
             AS containment
    FROM pairs p
    JOIN sz sa ON sa.doc_id = p.doc_a
    JOIN sz sb ON sb.doc_id = p.doc_b
    WHERE p.n_shared / CAST(least(sa.n, sb.n) AS DOUBLE) >= {_CONT_TAU}
    ORDER BY doc_a, doc_b
    """,
    category="dedup",
)
def d15(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment pairs via an inverted-index OVERLAP join —
    the measure quote/boilerplate detection needs where Jaccard (d05,
    d11) fails: a short document fully quoted inside a long one has low
    Jaccard but containment |A∩B| / min(|A|,|B|) ≈ 1.

    The pair-generation pattern here is the one the rest of the family
    doesn't exercise: the shingle→docs inverted index ITSELF is the
    block key (no signatures, no length buckets) — pairs exist only for
    docs sharing a concrete shingle, shared-shingle counts come from one
    hash-agg on (doc_a, doc_b), and a document-frequency cap
    ({max_df}, the ``lsh_candidate_pairs`` degenerate-bucket guard
    applied to raw shingles) BOUNDS the quadratic term: per kept
    shingle at most C({max_df},2) ≈ 8k pairs, so total pair volume is
    linear in distinct informative shingles. The cap is semantic, not
    just a perf guard — a shingle ubiquitous across >{max_df} documents
    is boilerplate by declaration and carries no containment evidence;
    the oracle applies the identical HAVING bound, so the declared
    measure ("containment over informative shingles") stays
    hash-checked. Set sizes join back broadcast-ably (one row/doc).
    """
    sh = _shingled(spark, sf)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = (
        lsh_candidate_pairs(sh, "shingle", max_bucket=_CONT_MAX_DF)
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    cont = F.col("n_shared") / F.least("na", "nb").cast("double")
    return (
        pairs.join(sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
        .filter(cont >= _CONT_TAU)
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(cont, 4).alias("containment"),
        )
        .orderBy("doc_a", "doc_b")
    )


d15.__doc__ = d15.__doc__.format(max_df=_CONT_MAX_DF)
