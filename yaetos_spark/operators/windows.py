"""Window-based operators: sessionization, as-of join, top-k per group.

The reference's only window usage is first/last-timestamp
sessionization (reference: jobs/examples/ex2_frameworked_job.py:28-47)
and the non-unique-PK finder; this module generalizes the surface with
the standard large-scale patterns, all pure DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yaetos_spark.operators._guards import reserve_helper_cols


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
    reserve_helper_cols("sessionize", ("_new_session",), df)
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
    reserve_helper_cols("asof_join", ("_t", "_side", "_rfill", "_asof_ts"), left, right)
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
    # Carry ONE struct of all right columns (not each column
    # independently): if the as-of right row has a NULL in some column,
    # that NULL is kept rather than back-filled from an older right row
    # — every carried value comes from the same matched row.
    rstruct = F.when(F.col("_side") == 0, F.struct(*[F.col(c) for c in right_cols]))
    filled = unioned.withColumn("_rfill", F.last(rstruct, ignorenulls=True).over(w))
    asof_ts = F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True).over(w)
    filled = filled.withColumn("_asof_ts", asof_ts)
    for c in right_cols:
        filled = filled.withColumn(c, F.col("_rfill").getField(c))
    out = filled.filter(F.col("_side") == 1).drop("_side", "_t", "_rfill")
    return out.withColumnRenamed("_asof_ts", f"asof_{right_ts}")


def global_rank(
    df: DataFrame,
    order_col: str,
    rank_name: str = "global_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global dense row numbering WITHOUT a single-partition sort.

    The classic two-phase distributed ranking: range-repartition on the
    order column (each partition holds a contiguous key range), count
    rows per partition, bring back only the per-partition counts (one
    tiny row per partition — bounded by the partition count, never by
    the data), and add each partition's cumulative offset to its local
    row_number. Equivalent to ``row_number() OVER (ORDER BY order_col)``
    up to permutation of ties, but every sort stays partition-local.
    """
    df_rank, _ = _global_rank_with_total(df, order_col, rank_name, num_partitions)
    return df_rank


def _global_rank_with_total(
    df: DataFrame,
    order_col: str,
    rank_name: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Shared core: ranked frame + the exact total row count, which the
    offset pass computes anyway — callers that need N (distributed_ntile)
    must not pay a second full pass for it."""
    reserve_helper_cols("global_rank", ("_bucket",), df)
    spark = df.sparkSession
    dtype = dict(df.dtypes).get(order_col, "")
    if dtype in ("string", "binary", "boolean"):
        raise ValueError(
            f"global_rank needs a numeric/temporal order column; '{order_col}' is {dtype} "
            "(percentile bucketing cannot range-split it — use row_number for small data)"
        )
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # Range boundaries must be a pure function of the DATA, not of a
    # per-job sample (repartitionByRange re-samples every job, so the
    # count pass and the rank pass could disagree on bucket membership).
    qs = [i / num_partitions for i in range(1, num_partitions)]
    bounds = df.agg(
        F.percentile_approx(order_col, qs, 2_000).alias("b")
    ).collect()[0]["b"] or []
    # strictly increasing boundary list (duplicates collapse — a hot
    # value always maps to one bucket)
    uniq = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    if uniq:
        barr = F.array(*[F.lit(b) for b in uniq])
        bucket = F.size(F.filter(barr, lambda b: F.col(order_col) > b))
    else:
        bucket = F.lit(0)
    parts = df.withColumn("_bucket", bucket)
    sizes = {
        r["_bucket"]: r["n"]
        for r in parts.groupBy("_bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(sizes):
        offsets[b] = acc
        acc += sizes[b]
    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])]),
        F.col("_bucket"),
    )
    w = Window.partitionBy("_bucket").orderBy(order_col)
    ranked = parts.withColumn(rank_name, F.row_number().over(w) + offset_col).drop("_bucket")
    return ranked, acc


def distributed_ntile(
    df: DataFrame,
    order_col: str,
    n: int,
    band_name: str = "band",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY order_col)`` without the global
    single-partition window Spark would otherwise plan.

    Exact ntile bucket sizes: with N rows, the first ``N % n`` buckets
    get ``N // n + 1`` rows. Band assignment is a closed-form expression
    over the two-phase :func:`global_rank`, so the only data movement is
    one range repartition; aggregate results are identical to the
    built-in ntile (tie permutations can only swap rows within equal
    values, which straddle band boundaries symmetrically).
    """
    reserve_helper_cols("distributed_ntile", ("_grank", "_small", "_big", "_thr"), df)
    ranked, total = _global_rank_with_total(df, order_col, "_grank", num_partitions)
    # total is already exact on the driver (sum of the per-bucket counts
    # the offset pass collected) — no second pass over the data, and all
    # band parameters become plan literals
    small, big = total // n, total % n
    thr = big * (small + 1)
    # exact integer arithmetic only (DIV) — float division would mis-floor
    # once operands outgrow a double's 53-bit mantissa
    return (
        ranked
        .withColumn("_small", F.lit(small).cast("long"))
        .withColumn("_big", F.lit(big).cast("long"))
        .withColumn("_thr", F.lit(thr).cast("long"))
        .withColumn(
            band_name,
            F.expr(
                "CAST(CASE WHEN _grank <= _thr THEN (_grank - 1) DIV (_small + 1) "
                "ELSE _big + CASE WHEN _small > 0 THEN (_grank - 1 - _thr) DIV _small ELSE 0 END "
                "END + 1 AS INT)"
            ),
        )
        .drop("_grank", "_small", "_big", "_thr")
    )


def _gt_bound(order_col: str):
    # one-arg HOF lambda capturing the column name (a default arg would
    # make PySpark treat it as the two-arg (element, index) form)
    return lambda b: F.col(order_col) > b


def distributed_ntile_multi(
    df: DataFrame,
    specs: list[tuple[str, int, str]],
    num_partitions: int | None = None,
) -> DataFrame:
    """Several global ntiles over ONE cached frame — fused driver passes.

    ``specs`` is ``[(order_col, n, band_name), ...]``. Semantically
    identical to chaining :func:`distributed_ntile` per spec, but the
    sequential version pays 2 driver collects per metric over a lineage
    that re-executes every earlier metric's window (2k jobs, each
    re-running the upstream plan). Here the input is cached once and:

    - ONE boundary job computes ``percentile_approx`` for all metrics,
    - ONE sizes job counts all (metric, bucket) cells via a posexplode
      of the per-row bucket ids (k×P tiny rows to the driver),
    - the output plan chains k partition-local windows (one range
      exchange each) with every band parameter inlined as a literal.

    Same scale properties as the single-metric version: no global
    single-partition window, driver traffic bounded by k × partitions.
    """
    spark = df.sparkSession
    dtypes = dict(df.dtypes)
    for order_col, _, _ in specs:
        if dtypes.get(order_col, "") in ("string", "binary", "boolean"):
            raise ValueError(
                f"distributed_ntile_multi needs numeric/temporal order columns; "
                f"'{order_col}' is {dtypes.get(order_col)}"
            )
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    qs = [i / num_partitions for i in range(1, num_partitions)]

    df = df.cache()
    # one job: boundaries for every metric
    brow = df.agg(
        *[
            F.percentile_approx(c, qs, 2_000).alias(f"_bounds_{i}")
            for i, (c, _, _) in enumerate(specs)
        ]
    ).collect()[0]

    parts = df
    bucket_cols = []
    for i, (order_col, _, _) in enumerate(specs):
        uniq = []
        for b in brow[f"_bounds_{i}"] or []:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        if uniq:
            barr = F.array(*[F.lit(b) for b in uniq])
            bucket = F.size(F.filter(barr, _gt_bound(order_col)))
        else:
            bucket = F.lit(0)
        bucket_cols.append(f"_bkt_{i}")
        parts = parts.withColumn(f"_bkt_{i}", bucket)
    parts = parts.cache()

    # one job: per-(metric, bucket) counts for every metric at once
    pairs = parts.select(
        F.posexplode(F.array(*[F.col(c) for c in bucket_cols])).alias("_m", "_b")
    )
    sizes: dict[int, dict[int, int]] = {i: {} for i in range(len(specs))}
    for r in pairs.groupBy("_m", "_b").agg(F.count(F.lit(1)).alias("n")).collect():
        sizes[r["_m"]][r["_b"]] = r["n"]
    # parts is materialized now; the base frame's cache slot is dead
    # weight from here on (parts carries the data the final job needs)
    df.unpersist()

    out = parts
    for i, (order_col, n, band_name) in enumerate(specs):
        offsets, acc = {}, 0
        for b in sorted(sizes[i]):
            offsets[b] = acc
            acc += sizes[i][b]
        total = acc
        offset_col = F.element_at(
            F.create_map(*[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])]),
            F.col(f"_bkt_{i}"),
        )
        w = Window.partitionBy(f"_bkt_{i}").orderBy(order_col)
        grank = F.row_number().over(w) + offset_col
        small, big = total // n, total % n
        thr = big * (small + 1)
        # same closed-form band expression as distributed_ntile, with
        # the parameters inlined as literals (exact integer DIV only)
        out = out.withColumn("_grank", grank).withColumn(
            band_name,
            F.expr(
                f"CAST(CASE WHEN _grank <= {thr}L THEN (_grank - 1) DIV {small + 1}L "
                f"ELSE {big}L + CASE WHEN {small}L > 0 THEN (_grank - 1 - {thr}L) DIV {small}L ELSE 0 END "
                "END + 1 AS INT)"
            ),
        ).drop("_grank")
    return out.drop(*bucket_cols)
