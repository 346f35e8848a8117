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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_kafka_frame(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Rows → (key, value) JSON frame accepted by the kafka sink."""
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    if key_col:
        return df.select(F.col(key_col).cast("string").alias("key"), value)
    return df.select(value)


def validate_kafka_frame(frame: DataFrame, schema: dict) -> DataFrame:
    """Drop messages that fail jsonschema validation (behavior parity:
    the reference validates each message before produce and skips
    invalid ones — yaetos/kafka_utils.py:41-66 — but does it in a
    driver-side producer loop; here validation runs executor-side over
    Arrow batches, one compiled validator per batch, fully parallel)."""
    import json

    from pyspark.sql.functions import pandas_udf

    try:  # driver-side capability gate; executors are assumed homogeneous
        import jsonschema  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError("kafka message validation requires jsonschema") from exc

    schema_json = json.dumps(schema)  # ship as a plain string, not a closure over objects

    @pandas_udf("boolean")
    def _valid(vals: pd.Series) -> pd.Series:
        import json as _json

        import jsonschema

        validator = jsonschema.validators.validator_for(_json.loads(schema_json))(
            _json.loads(schema_json)
        )

        def check(v):
            try:
                return validator.is_valid(_json.loads(v))
            except Exception:
                return False

        return vals.map(check)

    return frame.filter(_valid(F.col("value")))


def push_to_kafka(
    df: DataFrame,
    topic: str,
    brokers: str,
    key_col: str | None = None,
    message_schema: dict | None = None,
) -> None:
    frame = build_kafka_frame(df, key_col)
    if message_schema is not None:
        frame = validate_kafka_frame(frame, message_schema)
    (
        frame.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )
