"""Driver-visible face of the ML parity pipeline (rows-only check).

Not SQL-expressible (MLlib training) → no oracle entry; the driver records
the weaker rows+schema check, and tests/test_ml.py carries the real
invariants (seed determinism, save/load equivalence, baseline-beating
accuracy, streaming-score parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from final_project_big_data_spark.ml import pipeline as M
from final_project_big_data_spark.queries import query


@query("m01_rf_prepare_train_score", oracle=None, category="ml")
def m01(spark: SparkSession, sf: str) -> DataFrame:
    """Full reference flow prepare→train→score on the synthetic creditcard
    fixture (sf-independent), reduced forest for check runtime.

    Mirrors ``prepare_data.py`` → ``train_model.py`` → ``predict.py``
    (batch form); output envelope = ``{Time, Amount, actual_label,
    predicted_label}`` (``predict.py:37-44``).
    """
    cc = M.synth_creditcard(spark, n_rows=2000, seed=42)
    sampled = M.stratified_sample(cc, n_target=1500, seed=42)
    train_df, test_df = M.stratified_split(sampled, (0.7, 0.3), seed=42)
    model = M.train(train_df, num_trees=10, max_depth=5, seed=42)
    return M.prediction_envelope(M.score(model, test_df)).orderBy("Time")
