"""Window-based operators: sessionization, as-of join, top-k per group.

The reference's only window usage is first/last-timestamp
sessionization (reference: jobs/examples/ex2_frameworked_job.py:28-47)
and the non-unique-PK finder; this module generalizes the surface with
the standard large-scale patterns, all pure DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_bounds(
    df: DataFrame,
    key: str,
    ts_col: str,
) -> DataFrame:
    """Per-key first/last timestamp, duration and event count.

    Uses min/max aggregates (one shuffle) rather than first_value/
    last_value windows — same result, half the cost, and immune to the
    default-window-frame trap the reference hit (its last_value saw
    only unboundedPreceding→currentRow)."""
    return df.groupBy(key).agg(
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias("delta_sec"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based session ids: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``.

    lag + cumulative-sum-of-boundaries — the canonical batch
    sessionization; one shuffle on the key."""
    w = Window.partitionBy(key).orderBy(ts_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    df = df.withColumn("_new_session", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0))
    df = df.withColumn(
        "session_seq",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new_session")
    return df.withColumn("session_id", F.concat_ws("-", F.col(key).cast("string"), F.col("session_seq")))


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_break: str | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number window (one shuffle)."""
    order = [F.desc(order_col) if descending else F.asc(order_col)]
    if tie_break:
        order.append(F.asc(tie_break))
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts (backward) or earliest with >= (forward), per
    key.

    Implemented as the scalable union-sort-fill plan: tag both sides,
    union, and carry the last-seen right values forward within the key
    ordered by time — ONE shuffle on (key, time), no range cross-join,
    no per-group pandas. This survives arbitrarily large sides.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    l_tag = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        *[F.col(c) for c in right_cols],
    ).withColumn("_side", F.lit(0))
    # align schemas for union
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    for c in right_cols + [right_ts]:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None))
    all_cols = [key, "_t", "_side"] + [c for c in left.columns if c not in (key,)] + right_cols
    seen = set()
    ordered_cols = [c for c in all_cols if not (c in seen or seen.add(c))]
    unioned = l_tag.select(*ordered_cols).unionByName(r_tag.select(*ordered_cols))

    if direction == "backward":
        # right rows sort before left rows at equal _t so <= matches
        w = Window.partitionBy(key).orderBy(F.col("_t").asc(), F.col("_side").asc()) \
            .rowsBetween(Window.unboundedPreceding, 0)
    else:
        w = Window.partitionBy(key).orderBy(F.col("_t").desc(), F.col("_side").asc()) \
            .rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned
    for c in right_cols:
        filled = filled.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    asof_ts = F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w)
    filled = filled.withColumn("_asof_ts", asof_ts)
    out = filled.filter(F.col("_side") == 1).drop("_side", "_t")
    return out.withColumnRenamed("_asof_ts", f"asof_{right_ts}")
