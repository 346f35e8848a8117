"""Streaming CDC upsert: foreachBatch merge into a bucketed parquet
snapshot, rewriting ONLY the buckets a batch touches.

The 100 TB design point: a snapshot table partitioned by a key-hash
bucket column. Each micro-batch compacts its rows to one-per-key,
reads back just the buckets those keys land in, merges, and overwrites
those buckets alone via dynamic partition overwrite — cost per batch
is O(touched buckets), not O(snapshot). Replaying a failed batch
rewrites the same buckets with the same content (foreachBatch's
idempotence recipe). A full-rewrite variant would not survive at
scale, which is why it isn't offered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from yaetos_spark.operators.merge import latest_snapshot, upsert

BUCKET_COL = "_bucket"


def _bucket(keys: list[str], n_buckets: int):
    return F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n_buckets))


def merge_batch_into_snapshot(
    batch_df: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    order_col: str,
    n_buckets: int = 64,
) -> None:
    """One micro-batch of the streaming upsert (usable standalone for
    batch CDC too). Compact → read touched buckets → merge →
    dynamically overwrite those buckets."""
    spark = batch_df.sparkSession
    compacted = latest_snapshot(batch_df, keys, order_col).withColumn(
        BUCKET_COL, _bucket(keys, n_buckets)
    )
    touched = [r[BUCKET_COL] for r in compacted.select(BUCKET_COL).distinct().collect()]
    if not touched:
        return
    try:
        existing = spark.read.parquet(snapshot_dir).where(
            F.col(BUCKET_COL).isin(touched)
        )
        merged = upsert(existing, compacted, keys)
    except AnalysisException:  # first batch: snapshot doesn't exist yet
        merged = compacted
    # materialize before writing: the merge reads the very files the
    # dynamic overwrite below replaces, so the lineage must be cut
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(snapshot_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def streaming_upsert(
    stream_df: DataFrame,
    snapshot_dir: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
):
    """Wire a stream into the bucketed snapshot via foreachBatch.
    Returns the started query (trigger availableNow — call
    ``awaitTermination()``); re-run to process newly arrived data
    incrementally through the shared checkpoint."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into_snapshot(batch_df, snapshot_dir, keys, order_col, n_buckets)

    return (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_snapshot(spark, snapshot_dir: str) -> DataFrame:
    """Current state of the snapshot (drops the layout column)."""
    return spark.read.parquet(snapshot_dir).drop(BUCKET_COL)
