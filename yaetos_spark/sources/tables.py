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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
