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
    every partitioning (a bare desc(order_col) row_number would pick
    whichever tied row the shuffle delivered first, breaking batch-
    replay idempotence downstream). The classic CDC-compaction step."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.desc(F.xxhash64(*[F.col(c) for c in df.columns]))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


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
