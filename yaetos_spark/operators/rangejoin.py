"""Range / interval joins without a cross join.

Spark has no native range-join optimization (Databricks' range-join
hint is proprietary); the portable scale pattern is bucketization:
quantize the range dimension, equi-join on the bucket (candidate
pairs are adjacent buckets only), then apply the exact predicate.
Cost: linear in data + true match volume, instead of |L|×|R|.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yaetos_spark.operators._guards import reserve_helper_cols


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float | int,
    how: str = "inner",
    max_buckets_per_interval: int = 2_000_000,
) -> DataFrame:
    """Join point rows to interval rows with
    ``start <= point <= end``.

    Intervals are exploded to the buckets they overlap (an interval of
    width w covers ~w/bucket_width buckets — pick bucket_width near the
    median interval width); points land in exactly one bucket; the
    equi-join on the bucket is followed by the exact containment
    filter. All JVM-side.

    ``max_buckets_per_interval`` guards the explode: ONE outlier
    interval — the classic case is an open-ended sentinel end date
    (9999-12-31) bucketized at minutes — covers 10^7+ buckets, which
    is both a multi-GB single-row ``sequence`` array (executor OOM)
    and that many join-probe rows, silently. Raise naming the
    interval's bucket count so the caller widens ``bucket_width`` or
    caps the sentinel ends; the default (2M) is far above any
    median-width-tuned explode and below the OOM cliff."""
    if how != "inner":
        # the containment filter runs AFTER the join, so outer-join
        # unmatched rows (NULL start/end) would be silently dropped and
        # bucket-exploded intervals would duplicate outer-side rows —
        # refuse rather than return wrong outer semantics
        raise ValueError("interval_join supports how='inner' only")
    reserve_helper_cols("interval_join", ("_bk",), points, intervals)
    p = points.withColumn("_bk", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long"))
    lo_bk = F.floor(F.col(start_col) / F.lit(bucket_width)).cast("long")
    hi_bk = F.floor(F.col(end_col) / F.lit(bucket_width)).cast("long")
    n_bk = hi_bk - lo_bk + F.lit(1)
    # the guard is gated on n_bk being NON-NULL: a NULL start/end makes
    # n_bk NULL, and under inner-join semantics that interval must simply
    # drop (sequence(NULL, ..) -> NULL -> explode emits nothing) — a bare
    # `when(n_bk <= cap)` would route NULL bounds into the raise branch
    iv = intervals.withColumn(
        "_bk",
        F.explode(
            F.when(
                n_bk.isNull() | (n_bk <= F.lit(max_buckets_per_interval)),
                F.sequence(lo_bk, hi_bk),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("interval_join: an interval ["),
                        F.coalesce(F.col(start_col).cast("string"), F.lit("NULL")),
                        F.lit(", "),
                        F.coalesce(F.col(end_col).cast("string"), F.lit("NULL")),
                        F.lit("] covers "),
                        n_bk.cast("string"),
                        F.lit(
                            f" buckets at bucket_width={bucket_width}, over "
                            f"max_buckets_per_interval={max_buckets_per_interval} — "
                            f"widen bucket_width or cap sentinel interval ends."
                        ),
                    )
                )
            )
        ),
    )
    joined = p.join(iv, "_bk", how).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_bk")


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    tolerance: float | int,
    bucket_width: float | int | None = None,
) -> DataFrame:
    """Join rows where ``|left.left_col - right.right_col| <= tolerance``
    (a band join). Each side maps to its bucket; left probes its own and
    neighbor buckets — the probe fan-out is ceil(tolerance/bucket_width)
    buckets each way, so any bucket_width stays correct (narrower
    buckets trade a wider fan-out for tighter candidate sets)."""
    reserve_helper_cols("band_join", ("_bk", "_bk0"), left, right)
    w = bucket_width or tolerance
    reach = int(math.ceil(tolerance / w))
    l_b = left.withColumn("_bk", F.floor(F.col(left_col) / F.lit(w)).cast("long"))
    r_b = right.withColumn("_bk0", F.floor(F.col(right_col) / F.lit(w)).cast("long"))
    l_probe = l_b.withColumn(
        "_bk",
        F.explode(F.array(*[F.col("_bk") + d for d in range(-int(reach), int(reach) + 1)])),
    )
    joined = l_probe.join(r_b, l_probe._bk == r_b._bk0).filter(
        F.abs(F.col(left_col) - F.col(right_col)) <= F.lit(tolerance)
    )
    return joined.drop("_bk", "_bk0")
