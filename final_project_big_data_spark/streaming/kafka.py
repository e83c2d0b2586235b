"""Production Kafka wiring (reference O18/O20/O26 parity).

The reference reads/writes Kafka with the ``spark-sql-kafka-0-10`` connector
(``/root/reference/tasks/exes/predict.sh:3`` pins
``org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.1``; source options at
``tasks/scripts/predict.py:22-27``, sink at ``predict.py:47-53``, batch sink
at ``producer.py:34-38``). This container has no Kafka broker or connector
jar, so these builders configure the reader/writer WITHOUT triggering
source resolution (``.load()``/``.start()`` is the caller's move on a
cluster with ``--packages %s``); everything downstream of the source —
``from_json`` parse, scoring, envelope — is the broker-independent code
tested against file streams (SURVEY §1.5: same schema, same plan).

The option sets live in plain dict builders (round 9) so the sandbox CI
lane can pin the EXACT plumbing a broker host will execute, and
``tests/test_streaming.py::test_kafka_e2e_lane`` runs the full
produce→consume round-trip wherever ``SPARK_GRAFT_KAFKA_BOOTSTRAP``
points at a live broker.
"""

from __future__ import annotations

import pyspark
from pyspark.sql import DataFrame, SparkSession

#: the connector coordinate for THIS Spark build (reference predict.sh:3
#: pins the same artifact line for its Spark version)
KAFKA_PACKAGE = (
    f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}"
)


def kafka_source_options(
    bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """Reader options, reference predict.py:22-27 parity."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint: str
) -> dict[str, str]:
    """Streaming-writer options, reference predict.py:47-53 parity."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def kafka_source_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
):
    """Configured streaming reader (reference predict.py:22-27). Caller
    runs ``.load()`` where the connector jar is on the classpath."""
    return spark.readStream.format("kafka").options(
        **kafka_source_options(bootstrap_servers, topic, starting_offsets)
    )


def kafka_sink_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
):
    """Configured streaming writer, append mode + checkpoint (reference
    predict.py:47-53). Caller runs ``.start()``. ``df`` must already carry
    a ``value`` column (``streaming.pipeline.encode_json``)."""
    return (
        df.writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap_servers, topic, checkpoint))
        .outputMode("append")
    )


def kafka_batch_writer(df: DataFrame, bootstrap_servers: str, topic: str):
    """One distributed batch write of all rows (replaces the reference's
    per-row loop, producer.py:27-43: one Spark job per message)."""
    return (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
