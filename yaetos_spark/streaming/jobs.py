"""Structured-Streaming flavor of the incremental loop.

The reference has no streaming operators (SURVEY §2.10) — its
incremental multi-pass batch loop is the substitute. Here the same
semantics run engine-natively: a file-source stream with
``trigger(availableNow=True)`` processes exactly the not-yet-seen
files (checkpointed), which IS the reference's "catch up to now then
stop" loop, but with Spark tracking the watermark instead of a
max-timestamp probe.

Also provides the standard streaming aggregation surface (watermark +
tumbling/sliding windows) used by the streaming tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ltz(df: DataFrame, ts_col: str) -> DataFrame:
    """Spark 4's ``withWatermark`` requires TIMESTAMP (LTZ); parquet
    written without a session timezone infers TIMESTAMP_NTZ and crashes
    with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE. Normalize here so any
    caller's NTZ source works."""
    if dict(df.dtypes).get(ts_col) != "timestamp":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def incremental_file_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
) -> DataFrame:
    """readStream over a growing folder — the streaming equivalent of
    the reference's per-period input re-scan."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts — late data beyond
    the watermark is dropped, state is bounded."""
    events = _ltz(events, ts_col)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, out_path: str, fmt: str = "parquet"):
    """Process everything currently available, then stop — the
    idempotent incremental pass."""
    q = (
        stream_df.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming query synchronously into an in-memory table
    (test harness path)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def dedup_stream(events: DataFrame, key_cols: list[str], ts_col: str, delay: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication: the first event per key passes,
    replays/retries arriving within ``delay`` of it are dropped, and
    the per-key state is evicted once the watermark moves past —
    bounded state, unlike dropDuplicates() whose key set grows forever
    on an unbounded stream. The dedup guarantee a CDC/event ingest
    needs at 100 TB: at-least-once upstream becomes exactly-once-
    per-key downstream with O(keys-in-flight) state, not O(all keys
    ever seen)."""
    events = _ltz(events, ts_col)
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_gap_sec: int,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: rows match when left_key == right_key and
    the right event lands within [0, max_gap_sec] after the left one.
    Key/timestamp column names must be distinct across the two sides
    (rename upstream), as in any self-describing join output.

    ``how``: 'inner', or 'left_outer' — a left row with no match within
    the gap is emitted with NULL right columns once the right-side
    watermark has passed its join window (so unattributed impressions
    surface instead of vanishing). Other join types are refused: right/
    full outer on this condition shape would need the mirrored time
    bound to evict state.

    Both sides carry watermarks and the join condition bounds event
    time in BOTH directions, which is what lets Spark evict join state:
    without the time bound each side would buffer forever waiting for
    arbitrarily-late matches. State per key is O(events inside the
    watermark + gap window) — the join a clickstream attribution
    pipeline (impression stream x conversion stream) runs at 100 TB.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(
            f"interval_join_streams supports 'inner' and 'left_outer', got '{how}'"
        )
    lw = _ltz(left, left_ts).withWatermark(left_ts, watermark)
    rw = _ltz(right, right_ts).withWatermark(right_ts, watermark)
    cond = (
        (lw[left_key] == rw[right_key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_gap_sec} SECONDS"))
    )
    return lw.join(rw, cond, how)
