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
