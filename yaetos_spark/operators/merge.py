"""Upsert / MERGE / SCD2 emulation — no Delta/Iceberg required.

The v1 container has no table-format jars; upserts are emulated the
portable way: anti-join + union for MERGE, window-latest for snapshot
dedup, and boundary derivation for slowly-changing dimensions (SCD2).
On Delta/Iceberg these become real ``MERGE INTO`` statements; the
call-sites stay the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """One row per key — the one with the greatest ``order_col``. Ties
    on order_col break by xxhash64 of the full row, which is a pure
    function of the row's values: the same winner on every run and
    every partitioning (a bare max-of-order_col pick would keep
    whichever tied row the shuffle delivered first, breaking batch-
    replay idempotence downstream). The classic CDC-compaction step.

    ``max_by(struct(*cols), (order_col, tiebreak))`` instead of the
    textbook ``row_number() over (partition by keys order by ...)``:
    the aggregate combines MAP-SIDE, so each partition contributes at
    most one row per key to the single shuffle, where the window ships
    every version of a key to one task — and a hot key (an entity
    updated 10^8 times in a CDC stream) makes that task the job.
    Struct comparison is lexicographic, so max over
    (order_col, xxhash64) picks exactly the row the desc/desc window
    ordering picked; column order and types are preserved."""
    ord_key = F.struct(
        F.col(order_col).alias("_o"),
        F.xxhash64(*[F.col(c) for c in df.columns]).alias("_tb"),
    )
    packed = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(F.struct(*[F.col(c) for c in df.columns]), ord_key).alias("_row")
    )
    return packed.select("_row.*")


def upsert(existing: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE semantics: rows from ``updates`` win on key collision,
    unmatched existing rows are kept. One anti-join + one union —
    both shuffle on the key, no driver involvement."""
    kept = existing.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
    return kept.unionByName(updates)


def scd2(
    history: DataFrame,
    keys: list[str],
    ts_col: str,
    end_of_time: str = "9999-12-31 00:00:00",
) -> DataFrame:
    """Change rows → SCD2 intervals: each version row gains
    ``valid_from`` (its own timestamp), ``valid_to`` (next version's
    timestamp or end-of-time) and ``is_current``."""
    w = Window.partitionBy(*keys).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w)
    return (
        history.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.coalesce(nxt, F.lit(end_of_time).cast("timestamp")))
        .withColumn("is_current", nxt.isNull())
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Temporal (as-of-validity) lookup: join each fact row to the
    dimension version whose [valid_from, valid_to) interval contains
    the fact's event time — "what was this user's plan WHEN they
    purchased", the standard SCD2 point-in-time join.

    The join is an EQUI-join on the keys with the interval predicate
    as a post-join filter, so Catalyst plans a hash join partitioned
    on the keys (never a range cross-join): per key the dimension has
    one row per version, which bounds the fan-out. Dimension key
    columns are dropped from the output (facts' values are identical
    by the join condition).
    """
    import functools
    import operator

    cond = functools.reduce(operator.and_, [facts[k] == dim[k] for k in keys])
    cond = cond & (facts[fact_ts] >= dim[valid_from]) & (facts[fact_ts] < dim[valid_to])
    out = facts.join(dim, cond, how)
    for k in keys:
        out = out.drop(dim[k])
    return out
