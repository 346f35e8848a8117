"""Loaders for the benchmark star schema (region nation customer
supplier part orders lineitem events documents embeddings).

``load_tables`` reads every table of a scale-factor directory,
normalizes nanosecond-timestamp columns (Spark has no ns timestamp —
the session reads them as raw longs via
``spark.sql.legacy.parquet.nanosAsLong`` and this loader converts to
microsecond timestamps with exact integer division), and registers a
temp view per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# columns stored as parquet TIMESTAMP(NANOS) that arrive as raw longs
_NANO_TS_COLS = {"events": ["ts"]}


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Make the session able to scan TIMESTAMP(NANOS) parquet.

    ``spark.sql.legacy.parquet.nanosAsLong`` is a runtime-settable SQL
    conf; setting it here means any caller's vanilla SparkSession (not
    just ones built by our session factory) can read events.parquet —
    the scan otherwise fails with PARQUET_TYPE_ILLEGAL."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf locked down (e.g. Spark Connect policy) — scan may still work


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, []):
        if col in df.columns and dict(df.dtypes).get(col) == "bigint":
            # integer div — double math would lose precision at 1e18 ns
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, register: bool = True) -> dict[str, DataFrame]:
    dfs = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
