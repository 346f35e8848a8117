"""Skew-aware aggregation and join helpers.

At 100 TB a single hot key (one user with 1% of all events, one
boilerplate document cluster) turns a groupBy/join into one straggler
task. AQE's skew-join splitting handles the join case at runtime;
these helpers give explicit control for aggregations and for joins
whose skew is known ahead of time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yaetos_spark.operators._guards import reserve_helper_cols


def salted_count(df: DataFrame, keys: list[str], salt_buckets: int = 32, count_col: str = "n") -> DataFrame:
    """Two-phase count: pre-aggregate on (key, salt) so the hot key's
    rows combine map-side across ``salt_buckets`` reducers, then merge.
    Result identical to ``groupBy(keys).count()``."""
    # Only _salt is withColumn'd onto the user frame; _partial exists
    # solely as an agg output alias in the derived partial frame, so an
    # input that happens to carry a _partial column cannot be corrupted
    # — don't reject it (ADVICE r10; matches salted_agg's guard).
    reserve_helper_cols("salted_count", ("_salt",), df)
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(count_col))


def salted_agg(df: DataFrame, keys: list[str], sums: dict[str, str], salt_buckets: int = 32) -> DataFrame:
    """Two-phase sum-aggregation: ``sums`` maps input column -> output
    alias. Only algebraic aggregates (sum/count/min/max) can be salted
    this way; averages are derived from sum+count afterwards."""
    reserve_helper_cols("salted_agg", ("_salt",), df)
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(src).alias(f"_p_{alias}") for src, alias in sums.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{alias}").alias(alias) for alias in sums.values()]
    )


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted equi-join for a skewed big side when the small side fits
    a modest replication factor: big rows get a random salt, small rows
    are replicated across all salts, and the join key becomes
    (key, salt) — the hot key spreads over ``salt_buckets`` tasks.

    Prefer ``F.broadcast(small)`` when small fits a broadcast; prefer
    AQE skew handling when skew is unknown. This is the explicit tool
    for the middle case."""
    reserve_helper_cols("replicated_skew_join", ("_salt",), big, small)
    big_s = big.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_s.join(small_r, [key, "_salt"]).drop("_salt")


def skew_report(df, keys, top_k: int = 5):
    """Heavy-hitter diagnostic: the top_k hottest key groups with their
    row counts and share of the table — the measurement that decides
    whether a join/agg on ``keys`` needs salting (`salted_agg`) or AQE
    skew handling before it burns a 100 TB shuffle. One hash-agg plus a
    TakeOrdered top-k; the only collect is the 1-row grand total.
    Deterministic: ties break on the key columns ascending."""
    from pyspark.sql import functions as F

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n")).collect()[0][0]  # 1-row action
    return (
        counts.orderBy(F.desc("n"), *[F.asc(k) for k in keys])
        .limit(top_k)
        .withColumn("share", F.col("n") / F.lit(total))
    )
