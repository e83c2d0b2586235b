"""final_project_big_data_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference pipeline ``louisdevzz/final-project-big-data``
(a credit-card fraud-detection big-data pipeline: batch prep, MLlib RF
training, Kafka replay, Structured-Streaming scoring — see SURVEY.md), plus
the full relational / streaming / LLM-data-pipeline operator inventory
declared in SURVEY.md §2.4.

Design principles (100 TB posture):
- DataFrame / SQL declarative plans; Catalyst + AQE pick physical strategy.
- No ``collect()`` on the data path (the reference's per-row producer loop,
  ``tasks/scripts/producer.py:27-43``, is the anti-pattern designed out).
- Broadcast small dimensions, partial aggregation, pushed-down filters.
- Python only at the edges; Arrow-batched pandas UDFs where unavoidable.
"""

__version__ = "0.1.0"

from final_project_big_data_spark.session import get_spark  # noqa: F401
