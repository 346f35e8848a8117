"""Kafka sink — batch push of a finished output as JSON messages.

Behavior parity: the reference pushes each output record through a
synchronous kafka-python producer with jsonschema validation
(reference: yaetos/kafka_utils.py:12-73, hook yaetos/etl_utils.py:728-730).
Spark-first replacement: serialize rows JVM-side with
``to_json(struct(*))`` and write through the Kafka datasource — fully
distributed, no driver loop. The kafka-clients jar is not in this
container; ``build_kafka_frame`` (the serialization plan) is tested,
the network write is invoked only against a real broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_kafka_frame(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Rows → (key, value) JSON frame accepted by the kafka sink."""
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    if key_col:
        return df.select(F.col(key_col).cast("string").alias("key"), value)
    return df.select(value)


def push_to_kafka(df: DataFrame, topic: str, brokers: str, key_col: str | None = None) -> None:
    (
        build_kafka_frame(df, key_col)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )
