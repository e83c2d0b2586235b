"""End-to-end corpus-curation pipeline query — the LLM training-data story
(SURVEY C20/C22 composed): score every document (quality heuristic +
language-ID argmax + token count), keep documents above a quality floor,
then drop normalized-fingerprint duplicates keeping the lowest doc_id.

One declared query so the whole pipeline is hash-checked against DuckDB
end-to-end, not just its pieces. All logic is built-in JVM expressions;
the dedup is a window min — a single hash shuffle on the fingerprint.
At 100 TB each stage stays embarrassingly parallel except that one
shuffle, whose key (md5) is uniformly distributed — no skew by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from final_project_big_data_spark.io import load_table
from final_project_big_data_spark.queries import query
from final_project_big_data_spark.queries.textops import _LANG_MARKERS, _STOPWORDS

_QUALITY_FLOOR = 0.3


def _oracle() -> str:
    scores = ",\n             ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INT) AS score_{lang}"
        for lang, pat in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    great = ", ".join(f"score_{lo}" for lo in langs)
    case = (
        "CASE "
        + " ".join(
            f"WHEN score_{lang} = greatest({great}) THEN '{lang}'"
            for lang in langs
        )
        + " END"
    )
    return rf"""
    WITH scored AS (
      SELECT doc_id,
             round(least(1.0, len(string_split_regex(trim(text), '\s+')) / 100.0)
                   * (1.0 - len(regexp_extract_all(text, '{_STOPWORDS}')) * 1.0
                          / len(string_split_regex(trim(text), '\s+'))), 4)
               AS quality,
             CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_tokens,
             md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp_norm,
             {scores}
      FROM documents
    ),
    curated AS (
      SELECT doc_id, quality, n_tokens, fp_norm, {case} AS pred_lang,
             row_number() OVER (PARTITION BY fp_norm ORDER BY doc_id) AS rn
      FROM scored WHERE quality >= {_QUALITY_FLOOR}
    )
    SELECT doc_id, pred_lang, quality, n_tokens
    FROM curated WHERE rn = 1
    ORDER BY doc_id
    """


def score_docs(d: DataFrame) -> DataFrame:
    """Stateless per-document scoring: quality heuristic, token count,
    normalized fingerprint, language argmax, quality-floor filter.

    Pure ``DataFrame -> DataFrame`` (map-only, no shuffle) so it runs
    identically on a batch frame and a streaming frame — the streaming
    curation path (``streaming/pipeline.py``) composes this with a
    stateful ``dropDuplicates``; the batch path (p01) with a window min.
    """
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    stops = F.regexp_count(F.col("text"), F.lit(_STOPWORDS))
    quality = F.round(
        F.least(F.lit(1.0), words / 100.0) * (1.0 - stops * 1.0 / words), 4
    )
    langs = list(_LANG_MARKERS)
    score_cols = [
        F.regexp_count(F.col("text"), F.lit(pat)).alias(f"score_{lang}")
        for lang, pat in _LANG_MARKERS.items()
    ]
    scored = d.select(
        "doc_id",
        quality.alias("quality"),
        words.alias("n_tokens"),
        F.md5(F.lower(F.regexp_replace("text", r"\s+", " "))).alias("fp_norm"),
        *score_cols,
    )
    best = F.greatest(*[F.col(f"score_{lo}") for lo in langs])
    pred = None
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return (
        scored.filter(F.col("quality") >= _QUALITY_FLOOR)
        .withColumn("pred_lang", pred)
        .select("doc_id", "pred_lang", "quality", "n_tokens", "fp_norm")
    )


@query("p01_corpus_curation", oracle=_oracle(), category="pipeline")
def p01(spark: SparkSession, sf: str) -> DataFrame:
    """Curate `documents`: quality floor → language tag → exact-normalized
    dedup (keep lowest doc_id per fingerprint). The composite the judge can
    run as one unit; the constituent operators are t02/t03/t04/d01.
    """
    d = load_table(spark, sf, "documents")
    rn = F.row_number().over(W.partitionBy("fp_norm").orderBy("doc_id"))
    return (
        score_docs(d)
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "pred_lang", "quality", "n_tokens")
        .orderBy("doc_id")
    )


# ------------------------------------------------- mixture + split (p02/p03)
# Training-data plumbing the reference never had but a 100 TB corpus needs:
# deterministic mixture sampling toward target language weights, and a
# content-hash train/val/test split. Both use the md5→uniform idiom from
# a08 (Efraimidis–Spirakis): no RNG state, identical row sets on every
# engine/run/partitioning — the property that makes corpus builds
# resumable and auditable.

_MIX_WEIGHTS = {"en": 0.45, "fr": 0.20, "de": 0.15, "es": 0.12, "zh": 0.08}
_MIX_BUDGET_FRAC = 0.4  # total mixture size: 40% of the corpus


def _mix_weight_sql() -> str:
    return (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {w}" for k, w in _MIX_WEIGHTS.items())
        + " ELSE 0.0 END"
    )


@query(
    "p02_corpus_mix",
    oracle=f"""
    WITH stats AS (
      SELECT lang, count(*) AS n_avail,
             (SELECT count(*) FROM documents) AS n_total
      FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang, n_avail,
             least(1.0, ({_mix_weight_sql()}) * n_total * {_MIX_BUDGET_FRAC}
                        / n_avail) AS rate
      FROM stats
    ),
    picked AS (
      SELECT d.lang, count(*) AS n_selected
      FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) / 4294967296.0 < r.rate
      GROUP BY d.lang
    )
    SELECT r.lang, CAST(r.n_avail AS BIGINT) AS n_avail,
           ROUND(r.rate, 4) AS rate,
           CAST(coalesce(p.n_selected, 0) AS BIGINT) AS n_selected
    FROM rates r LEFT JOIN picked p ON r.lang = p.lang
    ORDER BY r.lang
    """,
    category="pipeline",
)
def p02(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic corpus mixture sampling: hit target language weights
    (en .45 / fr .20 / de .15 / es .12 / zh .08) for a budget of 40% of
    the corpus, by per-language acceptance rates over a content-
    independent doc_id hash. Rate = min(1, weight·budget/available) —
    under-represented languages saturate at keeping everything, exactly
    how production data-mixing handles scarce languages.

    Plan: per-language counts (5-row aggregate) broadcast back onto the
    scan; the accept/reject test is a map-side expression on md5(doc_id)
    — the corpus is read ONCE, never shuffled (the only shuffle is the
    5-group summary). Identical selection on any engine, run, or
    partitioning; at 100 TB changing the mixture is a re-filter, not a
    re-shuffle.
    """
    d = load_table(spark, sf, "documents")
    weight = None
    for k, w in _MIX_WEIGHTS.items():
        weight = (
            F.when(F.col("lang") == k, w)
            if weight is None
            else weight.when(F.col("lang") == k, w)
        )
    weight = weight.otherwise(0.0)
    total = d.agg(F.count("*").alias("n_total"))
    rates = (
        d.groupBy("lang")
        .agg(F.count("*").alias("n_avail"))
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_avail",
            F.least(
                F.lit(1.0),
                weight * F.col("n_total") * F.lit(_MIX_BUDGET_FRAC) / F.col("n_avail"),
            ).alias("rate"),
        )
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    picked = (
        d.join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(u < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_selected"))
    )
    return (
        rates.join(picked, "lang", "left")
        .select(
            "lang",
            F.col("n_avail").cast("long").alias("n_avail"),
            F.round("rate", 4).alias("rate"),
            F.coalesce("n_selected", F.lit(0)).cast("long").alias("n_selected"),
        )
        .orderBy("lang")
    )


@query(
    "p03_hash_split",
    oracle="""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN u < 0.8 THEN 'train'
                  WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT lang,
                   CAST('0x' || substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) / 4294967296.0 AS u
            FROM documents)
    )
    SELECT split, lang, CAST(count(*) AS BIGINT) AS n
    FROM assigned GROUP BY split, lang ORDER BY split, lang
    """,
    category="pipeline",
)
def p03(spark: SparkSession, sf: str) -> DataFrame:
    """Content-hash train/val/test split (80/10/10): each document's
    assignment is a pure function of a salted doc_id hash — stable under
    re-runs, re-partitioning, engine changes, and corpus growth (old docs
    never migrate between splits when new docs arrive, unlike randomSplit
    (a04), whose assignment depends on partition layout and seed state).
    That stability is what keeps a 100 TB eval set uncontaminated across
    monthly corpus rebuilds. The salt ('split42:') makes this split
    independent of every other md5(doc_id) decision in the pipeline
    (p02's mixture, a07's reservoir) — unsalted, the same hash would
    correlate selections across operators.

    Plan: map-only assignment; the only shuffle is the (split, lang)
    summary aggregate.
    """
    d = load_table(spark, sf, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split42:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    split = (
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n"))
        .orderBy("split", "lang")
    )


_TEMP_ALPHA = 0.5  # temperature exponent: p_lang ∝ n_lang^α


@query(
    "p04_temperature_resample",
    oracle=f"""
    WITH stats AS (SELECT lang, count(*) AS n_avail FROM documents GROUP BY lang),
    tot AS (
      SELECT sum(n_avail) AS n_total,
             sum(pow(n_avail, {_TEMP_ALPHA}) ORDER BY lang) AS z
      FROM stats
    ),
    rates AS (
      SELECT lang, n_avail,
             pow(n_avail, {_TEMP_ALPHA}) / z * n_total / n_avail AS rate
      FROM stats CROSS JOIN tot
    ),
    copies AS (
      SELECT d.lang,
             CAST(floor(r.rate) AS BIGINT)
             + CASE WHEN CAST('0x' || substr(md5('temp:' ||
                        CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                    / 4294967296.0 < r.rate - floor(r.rate)
                    THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN rates r ON d.lang = r.lang
    )
    SELECT r.lang, CAST(r.n_avail AS BIGINT) AS n_avail,
           ROUND(r.rate, 4) AS rate,
           CAST(coalesce(sum(c.n_copies), 0) AS BIGINT) AS n_out
    FROM rates r LEFT JOIN copies c ON c.lang = r.lang
    GROUP BY r.lang, r.n_avail, r.rate
    ORDER BY r.lang
    """,
    category="pipeline",
)
def p04(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based corpus resampling (α = 0.5): the data-mixing
    step multilingual LLM training actually uses — language shares are
    flattened to p_lang ∝ n_lang^α, so scarce languages are UPSAMPLED
    (rate > 1 → integer epochs + a deterministic fractional epoch) and
    dominant ones downsampled, at a budget equal to the corpus size.
    Unlike p02 (fixed target weights with saturation), the weights here
    are DERIVED from the corpus counts, and rates above 1 are honored by
    repetition instead of clamped.

    Per-document copy count = ⌊rate⌋ + (salted-md5 uniform < frac(rate)),
    so the resample is a pure function of (doc_id, corpus stats) — stable
    across engines, runs, and partitionings. For that claim to be LITERAL
    the rates themselves must be bit-deterministic, and a distributed
    float sum is not (association order follows partitioning; a last-ulp
    z difference can flip a doc across the ``u < frac(rate)`` threshold —
    ADVICE r9). So z is computed as an ORDERED fold: the O(#langs)
    per-lang stats collect into one array, ``array_sort`` fixes lang
    order, and ``aggregate(...)`` adds the pow terms left-to-right from
    0.0 — association order is now part of the PLAN, not an accident of
    partitioning. The oracle replays the identical order with
    ``sum(... ORDER BY lang)`` (DuckDB's ordered aggregate is the same
    sequential left-to-right accumulation). A plain sorted-partition sum
    would NOT work: Spark's EliminateSorts drops sorts under
    order-"insensitive" aggregates, silently reintroducing the bug.
    Plan: 5-row stats aggregate broadcast onto the scan; the copy
    decision is map-side; one summary agg; still lazy, no driver
    materialization. At 100 TB the actual materialization would be the
    same expression feeding ``explode(sequence(1, n_copies))`` — still
    shuffle-free.
    """
    d = load_table(spark, sf, "documents")
    stats = d.groupBy("lang").agg(F.count("*").alias("n_avail"))
    tot = stats.agg(
        F.sum("n_avail").alias("n_total"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("lang", "n_avail"))),
            F.lit(0.0),
            lambda acc, s: acc
            + F.pow(s["n_avail"].cast("double"), F.lit(_TEMP_ALPHA)),
        ).alias("z"),
    )
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_avail",
        (
            F.pow("n_avail", F.lit(_TEMP_ALPHA))
            / F.col("z")
            * F.col("n_total")
            / F.col("n_avail")
        ).alias("rate"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    copies = d.join(F.broadcast(rates.select("lang", "rate")), "lang").select(
        "lang",
        (
            F.floor("rate")
            + F.when(u < F.col("rate") - F.floor("rate"), 1).otherwise(0)
        ).alias("n_copies"),
    )
    picked = copies.groupBy("lang").agg(F.sum("n_copies").alias("n_out"))
    return (
        rates.join(picked, "lang", "left")
        .select(
            "lang",
            F.col("n_avail").cast("long").alias("n_avail"),
            F.round("rate", 4).alias("rate"),
            F.coalesce("n_out", F.lit(0)).cast("long").alias("n_out"),
        )
        .orderBy("lang")
    )
