"""Data-layout clustering: Z-order (Morton) multi-column sort keys.

A single-column sort (``sort_by`` in writers.py) tightens parquet
row-group min/max stats on ONE column; scans filtered on a second
column still read everything.  Z-ordering interleaves the bits of
several columns' ranks so rows close in the key are close in EVERY
dimension — the layout Delta's OPTIMIZE ZORDER BY and ClickHouse's
mortonEncode build — and row-group pruning then works for filters on
any clustered column (Morton 1966; Delta-style multi-dimensional
clustering).

Spark-first: the key is a pure-JVM expression (rank-normalize each
column against its min/max, then interleave ``bits_per_col`` bits with
shift/or terms — ``n_cols*bits`` plan nodes, whole-stage codegen);
the only driver traffic is one 1-row min/max agg.  The layout write is
``repartitionByRange`` on the key (the clustering shuffle — the point
of a layout job) + ``sortWithinPartitions`` + drop.

The reference has no layout operators (its writers are plain
``to_parquet``/COPY, yaetos/etl_utils.py:626-669); this extends the
sorted-write surface (writers.py ``sort_by``) to multiple dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yaetos_spark.operators._guards import reserve_helper_cols


def zorder_key(
    df: DataFrame, cols: list[str], bits_per_col: int = 16
) -> tuple[DataFrame, str]:
    """Append a ``_zorder`` long column interleaving ``bits_per_col``
    bits of each column's min/max-normalized rank.  Returns
    ``(df_with_key, key_col_name)``.

    ``n_cols * bits_per_col`` must fit a signed long (<= 62).  Null
    ranks sort first (rank 0).  Normalization uses one 1-row min/max
    aggregate — a driver scalar probe, never data-sized.
    """
    if len(cols) * bits_per_col > 62:
        raise ValueError(
            f"{len(cols)} cols x {bits_per_col} bits exceeds a signed long; "
            "lower bits_per_col"
        )
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns; use sort_by for one")
    reserve_helper_cols("zorder_key", ("_zorder",), df)
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"_hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]

    top = (1 << bits_per_col) - 1
    ranks = []
    for i, c in enumerate(cols):
        lo, hi = stats[f"_lo_{i}"], stats[f"_hi_{i}"]
        if lo is None or hi is None or hi == lo:
            ranks.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo) * top
        ranks.append(
            F.coalesce(
                F.least(F.greatest(F.round(scaled), F.lit(0)), F.lit(top)).cast("long"),
                F.lit(0).cast("long"),
            )
        )

    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits_per_col):
        for i, r in enumerate(ranks):
            # bit b of rank i lands at interleaved position b*n + i
            key = key + F.shiftleft(
                F.getbit(r, F.lit(b)).cast("long"), b * n + i
            )
    return df.withColumn("_zorder", key), "_zorder"


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Cluster rows for a layout write: range-partition on the Morton
    key (this shuffle IS the clustering — same role as OPTIMIZE
    ZORDER's rewrite), sort within partitions, drop the key.  The
    projection after the sort does not add an exchange, so file
    contents stay key-ordered."""
    keyed, key = zorder_key(df, cols, bits_per_col)
    if num_files:
        keyed = keyed.repartitionByRange(num_files, key)
    else:
        keyed = keyed.repartitionByRange(key)
    return keyed.sortWithinPartitions(key).drop(key)


def shuffle_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Deterministic pseudo-random global ORDER for training-shard
    writes: every row gets a position by md5 of its id, rows are
    range-partitioned into ``n_shards`` on that position, and sorted
    within each shard — so shard files read back-to-back yield one
    well-shuffled, REPRODUCIBLE sequence (same corpus + same salt =
    identical shard contents and order, on any cluster).

    The shuffle-before-training step of a data pipeline: sequential
    epoch readers must not see documents in ingestion order (source/
    time correlations become curriculum artifacts), and rand()-based
    shuffles are neither reproducible nor stable across retries of a
    failed write. ``salt`` varies the permutation (e.g. per epoch:
    salt="epoch1") without touching the data.

    Scale: one repartitionByRange shuffle (range boundaries from
    Spark's reservoir sample of the hash — uniform by construction, so
    shards come out even) + an in-partition sort; no global sort, no
    driver collect. Write with ``writers`` using the returned frame's
    partitioning as-is (repartition afterwards would destroy the
    order).
    """
    if n_shards < 1:
        raise ValueError(f"shuffle_shards: n_shards must be >= 1, got {n_shards}")
    reserve_helper_cols("shuffle_shards", ("_shard_pos",), df)
    pos = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    return (
        df.withColumn("_shard_pos", pos)
        .repartitionByRange(n_shards, "_shard_pos")
        .sortWithinPartitions("_shard_pos")
        .drop("_shard_pos")
    )
