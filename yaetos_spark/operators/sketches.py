"""Mergeable frequency sketches — distributed count-min.

A count-min sketch summarizes the frequency table of a (potentially
100 TB) key stream into a fixed ``depth x width`` grid of counters that
(a) fits in memory no matter the input size, (b) merges by cell-wise
addition (so per-partition / per-day sketches roll up), and (c) answers
point queries with a one-sided guarantee: ``estimate >= true_count``
always, and ``estimate <= true_count + eps*N`` with probability
``1 - delta`` for ``width = ceil(e/eps)``, ``depth = ceil(ln(1/delta))``
(Cormode & Muthukrishnan 2005).

Spark-first shape: the sketch IS a DataFrame of ``(row, bucket, cnt)``
cells — built with one explode (depth rows per key occurrence is avoided
by aggregating per key FIRST, then exploding the tiny distinct-key
frame) and one groupBy.  At scale this is a map-side-combinable
aggregation of at most ``depth * width`` output rows; estimation for a
candidate key set is an equi-join on (row, bucket) + a min-agg, never a
driver-side structure.

The reference has no sketch operators (its closest is pandas
``describe()`` in yaetos/pandas_utils.py); this is part of the
large-scale training-data extension surface, next to
approx_count_distinct / percentile_approx contracts in
``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_col, row: int, width: int, seed: int):
    # xxhash64 is Spark's stable 64-bit hash (fixed algorithm, seedable):
    # same key + seed always lands in the same bucket, across runs,
    # partitions, and cluster sizes.
    return F.pmod(F.xxhash64(key_col, F.lit(seed + row)), F.lit(width))


def count_min_build(
    df: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 8192,
    seed: int = 42,
    weight: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``df[key]`` as a DataFrame of
    ``(row int, bucket int, cnt long)`` cells.

    Two-phase: exact per-key partial counts first (one hash aggregation,
    map-side combinable — the only pass over the full data), then the
    per-key frame (|distinct keys| rows) explodes into ``depth`` cells
    and re-aggregates.  Total shuffle: one full-data groupBy + one
    distinct-key-sized groupBy; output is at most depth*width rows.

    Sketches built this way MERGE: union two cell frames and sum cnt
    per (row, bucket) — see ``count_min_merge``.
    """
    w = F.col(weight) if weight else F.lit(1)
    per_key = df.groupBy(F.col(key).alias("_k")).agg(F.sum(w).alias("_c"))
    cells = per_key.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(F.col("_k"), r, width, seed).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("cell"),
        F.col("_c"),
    )
    return (
        cells.groupBy("cell.row", "cell.bucket")
        .agg(F.sum("_c").alias("cnt"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of sketches built with identical
    (depth, width, seed) — the roll-up path for per-partition /
    per-day sketches."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 8192,
    seed: int = 42,
) -> DataFrame:
    """Point-query estimates for every row of ``keys``: the minimum
    over the sketch's ``depth`` counters the key hashes into.  Returns
    ``keys`` plus an ``est long`` column (0 for never-seen keys).

    Plan: explode keys into their depth coordinates, equi-join the cell
    frame (broadcast — a sketch is <= depth*width rows by construction),
    min-agg back per key.  No driver-side state.
    """
    coords = keys.select(
        F.col(key),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _bucket(F.col(key), r, width, seed).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("cell"),
    ).select(key, "cell.row", "cell.bucket")
    joined = coords.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key).agg(
        F.min(F.coalesce("cnt", F.lit(0))).alias("est")
    )
