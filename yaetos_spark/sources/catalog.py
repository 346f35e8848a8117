"""Catalog / metastore registration of materialized outputs.

Behavior parity with the reference's Athena/Glue registration
(reference: yaetos/athena.py:9-120, hook yaetos/etl_utils.py:704-717),
re-expressed as Spark catalog DDL: an external table over the written
location (``CREATE TABLE ... USING parquet LOCATION``) or a managed
``saveAsTable``. On a cluster whose catalog is Glue/Hive-backed the
same calls register there; locally they hit the embedded catalog, so
the path is fully testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_external_table(
    spark: SparkSession,
    table: str,
    location: str,
    fmt: str = "parquet",
    partition_cols: list[str] | None = None,
    replace: bool = True,
) -> None:
    """Register an already-written dataset folder as an external table."""
    if replace:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    partition = f" PARTITIONED BY ({', '.join(partition_cols)})" if partition_cols else ""
    spark.sql(f"CREATE TABLE {table} USING {fmt}{partition} LOCATION '{location}'")
    if partition_cols:
        spark.sql(f"MSCK REPAIR TABLE {table}")


def save_as_table(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> None:
    """Managed-table write; ``bucket_by=(n, cols)`` co-locates future
    joins/aggs on those columns without a shuffle (the bucketing the
    reference never had — key for repeated 100 TB joins)."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(table)
