"""Driver-visible face of the ML parity pipeline.

MLlib training itself is not SQL-expressible, so the driver-checked output
is the pipeline's closed-form INVARIANT FACETS (one boolean row an oracle
can assert as literals) rather than raw predictions — every facet failing
would flip a column to false and hash-mismatch. tests/test_ml.py carries
the deeper invariants (seed determinism, save/load equivalence,
baseline-beating accuracy, streaming-score parity) plus the raw
``{Time, Amount, actual_label, predicted_label}`` envelope parity
(``predict.py:37-44``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from final_project_big_data_spark.ml import pipeline as M
from final_project_big_data_spark.queries import query


@query(
    "m01_rf_prepare_train_score",
    oracle="""
    SELECT TRUE AS scored_nonempty, TRUE AS split_complete,
           TRUE AS split_disjoint, TRUE AS pred_domain_ok,
           TRUE AS label_domain_ok, TRUE AS beats_chance
    """,
    category="ml",
)
def m01(spark: SparkSession, sf: str) -> DataFrame:
    """Full reference flow prepare→train→score on the synthetic creditcard
    fixture (sf-independent), reduced forest for check runtime. Mirrors
    ``prepare_data.py`` → ``train_model.py`` → ``predict.py`` (batch form).

    Output = closed-form facets of that run (VERDICT r2 ask #9):
    scored_nonempty (the envelope has rows), split_complete
    (|train|+|test| == |sampled|), split_disjoint (no ``Time`` key in both
    halves — Time is unique by construction, FIXTURES.md §11),
    pred_domain_ok / label_domain_ok (predictions and labels ⊆ {0,1}),
    beats_chance (accuracy ≥ 0.9 on a 98%-majority-class task the forest
    separates by design). Exact counts are deliberately NOT emitted:
    Bernoulli sampling/splits are seed-deterministic only per partition
    layout, which the driver's foreign session does not pin.
    """
    cc = M.synth_creditcard(spark, n_rows=2000, seed=42)
    sampled = M.stratified_sample(cc, n_target=1500, seed=42)
    train_df, test_df = M.stratified_split(sampled, (0.7, 0.3), seed=42)
    model = M.train(train_df, num_trees=10, max_depth=5, seed=42)
    env = M.prediction_envelope(M.score(model, test_df))

    n_sampled = sampled.count()
    n_train, n_test = train_df.count(), test_df.count()
    n_overlap = train_df.select("Time").join(
        test_df.select("Time"), "Time", "inner"
    ).count()
    facets = env.agg(
        (F.count("*") > 0).alias("scored_nonempty"),
        F.lit(n_train + n_test == n_sampled).alias("split_complete"),
        F.lit(n_overlap == 0).alias("split_disjoint"),
        F.every(F.col("predicted_label").isin(0.0, 1.0)).alias("pred_domain_ok"),
        F.every(F.col("actual_label").isin(0, 1)).alias("label_domain_ok"),
        (
            F.avg(
                (F.col("predicted_label") == F.col("actual_label")).cast("double")
            )
            >= 0.9
        ).alias("beats_chance"),
    )
    return facets
