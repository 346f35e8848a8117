"""Incremental rollup maintenance — continuous-aggregate style.

The 100 TB pattern this encodes: a daily/hourly rollup table is
maintained by aggregating ONLY the newly-arrived slice and merging it
additively into the existing rollup — never by rescanning history.
That works exactly for the decomposable aggregates (sum, count, min,
max; avg = sum/count at read time) and is the batch analog of a
streaming windowed aggregation's state update (the reference's
incremental multi-pass loop recomputes per-period outputs; this is
the same idea applied to an aggregate table — SURVEY §2.11 extension).

Non-decomposable aggregates (count-distinct, exact quantiles) are
refused loudly: merging them additively silently double-counts.
Use HLL sketches (approx_count_distinct) for mergeable distincts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DELTA_AGGS = {
    "sum": lambda src, out: F.sum(src).alias(out),
    "count": lambda src, out: F.count(F.lit(1)).alias(out),
    "min": lambda src, out: F.min(src).alias(out),
    "max": lambda src, out: F.max(src).alias(out),
}

# how two partial values of each kind combine
_MERGE_AGGS = {
    "sum": F.sum,
    "count": F.sum,  # partial counts ADD
    "min": F.min,
    "max": F.max,
}


def rollup_delta(delta: DataFrame, keys: list[str], agg_spec: dict) -> DataFrame:
    """Aggregate one new slice. ``agg_spec``: {out_col: (kind, src_col)}
    with kind in sum/count/min/max (src_col ignored for count)."""
    aggs = []
    for out, (kind, src) in agg_spec.items():
        if kind not in _DELTA_AGGS:
            raise ValueError(
                f"aggregate '{kind}' is not decomposable — cannot be maintained "
                f"incrementally (use a sketch, e.g. approx_count_distinct)"
            )
        aggs.append(_DELTA_AGGS[kind](src, out))
    return delta.groupBy(*keys).agg(*aggs)


def merge_rollup(
    existing: DataFrame | None, delta_rollup: DataFrame, keys: list[str], agg_spec: dict
) -> DataFrame:
    """Merge a delta rollup into the existing rollup table (None on
    first build). One hash-agg over rollup-sized data — the raw slice
    never re-shuffles and history is never re-read."""
    if existing is None:
        return delta_rollup
    both = existing.select(delta_rollup.columns).unionByName(delta_rollup)
    aggs = [
        _MERGE_AGGS[kind](out).alias(out) for out, (kind, _) in agg_spec.items()
    ]
    return both.groupBy(*keys).agg(*aggs)


def incremental_rollup(
    existing: DataFrame | None, delta: DataFrame, keys: list[str], agg_spec: dict
) -> DataFrame:
    """rollup_delta + merge_rollup in one call. Invariant (tested):
    incremental_rollup(rollup(part1), part2) == rollup(part1 ∪ part2)."""
    return merge_rollup(existing, rollup_delta(delta, keys, agg_spec), keys, agg_spec)
