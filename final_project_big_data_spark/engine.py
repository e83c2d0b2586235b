"""Public engine facade — the three entry-point families of SURVEY.md §3.

The reference's entry points are shell-wrapped PySpark scripts
(``tasks/exes/*.sh`` → ``tasks/scripts/*.py``); the engine exposes the same
families as one API over a shared SparkSession:

- ``Engine.sql(text)``        — SQL text → Catalyst (batch prepare-style jobs)
- ``Engine.table(name)`` / ``Engine.query(name)`` — DataFrame composition
  over registered fixtures and the declared operator registry
- ``Engine.pipeline(...)``    — prepare → train → score (ml.pipeline)
- ``Engine.stream(...)``      — readStream → transform → writeStream
  (streaming.pipeline)

Everything is lazy DataFrames; nothing collects to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from final_project_big_data_spark.io import DEFAULT_SF_DIR, load_table, register_views
from final_project_big_data_spark.schemas import TABLE_NAMES


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._views_registered = False

    # -- SQL text entry point -------------------------------------------
    def sql(self, text: str) -> DataFrame:
        """Run SQL against the fixture tables (views registered lazily,
        once per engine). Catalyst handles the rest — no custom parser."""
        if not self._views_registered:
            register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(text)

    # -- DataFrame entry point ------------------------------------------
    def table(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(f"unknown table {name!r}")
        return load_table(self.spark, self.sf_dir, name)

    def query(self, name: str) -> DataFrame:
        """Instantiate a declared operator from the registry by name."""
        from final_project_big_data_spark.queries import all_specs

        return all_specs()[name].builder(self.spark, self.sf_dir)

    # -- pipeline entry point -------------------------------------------
    def pipeline(self, workdir: str, **kwargs) -> dict:
        """Reference-parity prepare → train → score flow (see runner)."""
        from final_project_big_data_spark.runner import run_reference_pipeline

        return run_reference_pipeline(self.spark, workdir, **kwargs)

    # -- streaming entry point ------------------------------------------
    def stream(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
        sink_path: str,
        checkpoint: str,
    ):
        """Stateless/stateful stream: transform a streaming DataFrame and
        write it with exactly-once file-sink semantics (reference O20–O27
        generalized; Kafka in production config, file/rate in tests)."""
        out = transform(source)
        return (
            out.writeStream.format("parquet")
            .option("path", sink_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
