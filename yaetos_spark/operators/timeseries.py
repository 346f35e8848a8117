"""Time-series regularization operators: resampling onto a fixed grid
and gap filling (last observation carried forward).

The ops a metrics/telemetry pipeline runs before feature extraction —
no analog in the reference (it stops at generic SQL; SURVEY §2
extension alongside the curation operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    interval_sec: int = 21600,
    max_buckets_per_key: int = 2_000_000,
) -> DataFrame:
    """Resample each key's series onto a fixed ``interval_sec`` grid
    spanning its own [min, max] bucket range, carrying the last
    observed value forward across empty buckets.

    Returns (key_col, bucket_sec, value_locf, is_observed).

    Scale: one shuffle aggregates events into (key, bucket) cells —
    the grid explode and the forward-fill window then run on the
    CELLS, whose size is keys x buckets regardless of raw event volume,
    so a 100 TB event table collapses before the expensive steps. The
    fill is last(ignorenulls) over a per-key ordered window — linear,
    no self-join. Dense grids per key are generated with
    sequence+explode, not a cross join against a calendar table.

    ``max_buckets_per_key`` guards the grid generation: ``sequence``
    materializes each key's dense grid as ONE in-memory array, so a
    single key whose [min, max] span covers 10^8+ buckets (a decades-
    stale sensor resampled at seconds) is an unsplittable multi-GB row
    — an executor OOM with no stack pointing at the cause. Raise,
    don't mislabel: the job fails naming the key and its bucket count
    so the caller coarsens ``interval_sec`` or windows the input. The
    default (2M buckets ≈ 16 MB per array) is far above any healthy
    grid and far below the OOM cliff.
    """
    # floor, not cast: cast('long') truncates toward zero, putting
    # pre-1970 (negative-epoch) timestamps in the wrong bucket
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)).cast("long") / interval_sec)
        * interval_sec
    ).cast("long")
    cells = (
        df.select(F.col(key_col), bucket.alias("bucket_sec"), F.col(value_col), F.col(ts_col))
        .groupBy(key_col, "bucket_sec")
        .agg(
            # struct ordering key: ties on ts break by value, so the
            # pick is deterministic across runs and partitionings
            F.max_by(value_col, F.struct(ts_col, value_col)).alias("_obs"),
            F.count(F.lit(1)).alias("_n_obs"),
        )
    )
    n_buckets = (F.col("_hi") - F.col("_lo")) / F.lit(interval_sec) + F.lit(1)
    grids = (
        cells.groupBy(key_col)
        .agg(F.min("bucket_sec").alias("_lo"), F.max("bucket_sec").alias("_hi"))
        .select(
            F.col(key_col),
            # NULL-gated guard: a key whose every ts is NULL has NULL
            # _lo/_hi, so n_buckets is NULL — that key has no grid and
            # must drop (sequence(NULL,..) -> NULL -> explode emits
            # nothing), not fire the raise branch via three-valued when
            F.explode(
                F.when(
                    n_buckets.isNull() | (n_buckets <= F.lit(max_buckets_per_key)),
                    F.sequence(F.col("_lo"), F.col("_hi"), F.lit(interval_sec)),
                ).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit("resample_locf: key "),
                            F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
                            F.lit(" spans "),
                            n_buckets.cast("long").cast("string"),
                            F.lit(
                                f" buckets at interval_sec={interval_sec}, over "
                                f"max_buckets_per_key={max_buckets_per_key} — the dense "
                                f"grid would be one multi-GB in-memory array; coarsen "
                                f"interval_sec, window the input, or raise the cap."
                            ),
                        )
                    )
                )
            ).alias("bucket_sec"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_sec")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grids.join(cells, [key_col, "bucket_sec"], "left")
        .select(
            key_col,
            "bucket_sec",
            F.last("_obs", ignorenulls=True).over(w).alias("value_locf"),
            # presence-based, so a bucket whose observed value is NULL
            # still reports observed
            F.col("_n_obs").isNotNull().alias("is_observed"),
        )
    )
