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


# ---------------------------------------------------------------------
# Bloom filter — membership sketch for join pruning
# ---------------------------------------------------------------------


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``expected_items`` keys at the
    target false-positive rate: ``m = -n ln p / (ln 2)^2``,
    ``k = (m/n) ln 2`` (Bloom 1970).  m is rounded up to a multiple of
    64 so the bitmap packs exactly into longs."""
    import math

    n = max(expected_items, 1)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def bloom_build(
    df: DataFrame, key: str, m_bits: int, k_hashes: int, seed: int = 77
) -> list[int]:
    """Build the bitmap DISTRIBUTEDLY and return it as ``m_bits/64``
    longs.  One pass: each key explodes into its k bit positions (the
    frame is distinct-key-sized if the caller pre-distincts; raw is
    also fine — duplicate bits are idempotent), positions groupBy their
    64-bit word with a ``bit_or`` of shifted bits (map-side
    combinable), and only ``m/64`` (word, bits) rows reach the driver —
    never the keys themselves.  Same driver-traffic contract as the
    ntile boundary collect in windows.py."""
    n_words = m_bits // 64
    pos = df.select(
        F.explode(
            F.array(*[
                F.pmod(F.xxhash64(F.col(key), F.lit(seed + i)), F.lit(m_bits))
                for i in range(k_hashes)
            ])
        ).alias("_pos")
    )
    words = (
        pos.select(
            (F.col("_pos") / 64).cast("int").alias("_word"),
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_bit"),
        )
        .groupBy("_word")
        .agg(F.expr("bit_or(_bit)").alias("_bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["_word"]] = r["_bits"]
    return bitmap


def bloom_might_contain(
    bitmap: list[int], key_col, m_bits: int, k_hashes: int, seed: int = 77
):
    """Boolean Column: True iff every one of the key's k bits is set.
    Pure JVM expression, so it rides whole-stage codegen and can sit
    directly in a ``.filter`` before a shuffle — no Python in the hot
    path.  The k positions go into ONE array tested with ``forall``, so
    the bitmap literal appears exactly once in the plan (k copies of an
    m/64-long array literal would blow the plan up the way a per-
    centroid when-chain does — the ivf_assign lesson).  Meant for
    bitmaps up to ~8k longs (512k bits); above that use the Arrow path
    in ``bloom_prefilter``."""
    # ONE py4j call for the whole bitmap literal — element-wise F.lit
    # would round-trip the gateway per word (~2ms each, seconds for a
    # few-hundred-word bitmap)
    arr = F.lit(bitmap).cast("array<long>")
    positions = F.array(*[
        F.pmod(F.xxhash64(key_col, F.lit(seed + i)), F.lit(m_bits))
        for i in range(k_hashes)
    ])
    return F.forall(
        positions,
        lambda pos: F.getbit(
            F.element_at(arr, (pos / 64).cast("int") + 1), (pos % 64).cast("int")
        )
        == 1,
    )


# above this many longs, the inline array literal stops being a
# reasonable Catalyst plan; switch to an Arrow-batched numpy probe
MAX_INLINE_BLOOM_WORDS = 8192


def _bloom_prefilter_arrow(
    big: DataFrame, big_key: str, bitmap: list[int], m_bits: int, k_hashes: int, seed: int
) -> DataFrame:
    """Large-bitmap path: ship the bitmap to executors once as a numpy
    array (closure-captured, Arrow workers cache it per batch-stream)
    and test membership vectorized per batch.  xxhash64 must match the
    JVM build side bit-for-bit, so the BUILD also computed positions
    with Spark's xxhash64 — here we re-derive positions JVM-side first
    and only do the bitmap lookup in Python, keeping the two hash
    implementations from ever having to agree."""
    import numpy as np

    # Spark longs are signed; words with bit 63 set arrive as negative
    # Python ints, which np.uint64 cannot take directly (DeprecationWarning
    # on numpy 1.26, OverflowError on >= 2.0) — reinterpret via int64.
    words = np.array(bitmap, dtype=np.int64).view(np.uint64)
    pos_cols = [
        F.pmod(F.xxhash64(F.col(big_key), F.lit(seed + i)), F.lit(m_bits)).alias(f"_p{i}")
        for i in range(k_hashes)
    ]
    with_pos = big.select(F.struct(*big.columns).alias("_row"), *pos_cols)

    def probe(batches):
        for pdf in batches:
            mask = np.ones(len(pdf), dtype=bool)
            for i in range(k_hashes):
                p = pdf[f"_p{i}"].to_numpy().astype(np.uint64)
                mask &= (words[p >> np.uint64(6)] >> (p & np.uint64(63))) & np.uint64(1) == 1
            yield pdf.loc[mask, ["_row"]]

    kept = with_pos.mapInPandas(probe, schema=with_pos.select("_row").schema)
    return kept.select("_row.*")


def bloom_prefilter(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    fpp: float = 0.01,
    expected_items: int | None = None,
    seed: int = 77,
) -> DataFrame:
    """Prune ``big`` to rows whose key MIGHT appear in ``small`` before
    an expensive shuffle join — the classic 100 TB pattern for a dim
    side that is too big to broadcast-hash-join but whose key SET fits
    a few-MB bitmap.  No false negatives, so ``bloom_prefilter(...)
    .join(small, ...)`` ("inner"/"semi") is exactly equal to the
    unpruned join; false positives only cost shuffled bytes.  The
    reference has no counterpart (closest: full joins in its SQL jobs);
    Spark's own runtime bloom (spark.sql.optimizer.runtime.bloomFilter)
    does this automatically only within one query — this operator makes
    it explicit and reusable across queries/jobs.

    Small bitmaps (<= MAX_INLINE_BLOOM_WORDS longs) inline as one array
    literal and filter in whole-stage codegen; bigger ones switch to an
    Arrow-batched numpy probe (positions still computed JVM-side with
    the same xxhash64 as the build).
    """
    if expected_items is None:
        # sizing only needs an order of magnitude: approx_count_distinct
        # is one pass, no exact-distinct shuffle; pad for its ±5% rsd
        expected_items = int(
            small.agg(F.approx_count_distinct(small_key).alias("n")).collect()[0]["n"] * 1.15
        )
    m_bits, k_hashes = bloom_params(expected_items, fpp)
    bitmap = bloom_build(
        small.select(small_key).distinct(), small_key, m_bits, k_hashes, seed
    )
    if len(bitmap) > MAX_INLINE_BLOOM_WORDS:
        return _bloom_prefilter_arrow(big, big_key, bitmap, m_bits, k_hashes, seed)
    return big.filter(
        bloom_might_contain(bitmap, F.col(big_key), m_bits, k_hashes, seed)
    )


# ---------------------------------------------------------------------
# HyperLogLog — mergeable distinct-count sketch
# ---------------------------------------------------------------------


def hll_build(df: DataFrame, key: str, p: int = 12, seed: int = 99) -> DataFrame:
    """HLL registers for ``df[key]`` as a DataFrame of
    ``(bucket int, rho int)`` — at most ``2^p`` rows regardless of
    input size (Flajolet et al. 2007).

    Spark-first: bucket = top ``p`` bits of xxhash64, rho = leading-
    zero count of the remaining ``64-p`` bits + 1, computed EXACTLY
    JVM-side as ``(64-p) - length(bin(w)) + 1`` — ``bin()`` drops
    leading zeros so ``length(bin(w))`` is w's integer bit-length,
    with none of the float-``log2`` off-by-one risk near powers of
    two.  One map-side-combinable max-agg; registers MERGE by
    bucket-wise max (``hll_merge``), the roll-up path for per-day /
    per-partition sketches.  Spark's own approx_count_distinct is this
    sketch fused into one agg — this variant exists for cross-job and
    streaming maintenance, where the REGISTERS are the persisted state.
    """
    h = F.xxhash64(F.col(key), F.lit(seed))
    # logical shifts: shiftrightunsigned keeps the top p bits unbiased,
    # and the shiftleft/shiftrightunsigned pair masks to the low 64-p bits
    bucket = F.shiftrightunsigned(h, 64 - p).cast("int")
    w = F.shiftrightunsigned(F.shiftleft(h, p), p)
    rho = F.when(w == 0, F.lit(64 - p + 1)).otherwise(
        F.lit(64 - p) - F.length(F.bin(w)) + 1
    )
    return (
        df.where(F.col(key).isNotNull())
        .select(bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Bucket-wise max of register frames built with identical
    (p, seed)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, p: int = 12) -> DataFrame:
    """Cardinality estimate from a register frame: one row
    ``(est long)``.  Raw harmonic-mean estimator with the standard
    small-range linear-counting correction (empty registers counted
    via ``m - count(*)``); all arithmetic in one single-row agg over
    the <=2^p register rows — no driver-side math on data."""
    import math

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)  # standard bias constant for m >= 128
    agg = sketch.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_inv"),
        F.count(F.lit(1)).alias("_nonzero"),
    ).select(
        (F.lit(alpha * m * m) / (F.col("_inv") + (F.lit(m) - F.col("_nonzero")))).alias("_raw"),
        (F.lit(m) - F.col("_nonzero")).alias("_zeros"),
    )
    est = F.when(
        (F.col("_raw") <= 2.5 * m) & (F.col("_zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_zeros")),
    ).otherwise(F.col("_raw"))
    return agg.select(F.round(est).cast("long").alias("est"))


# ---------------------------------------------------------------------
# Fixed-boundary histogram — mergeable quantile sketch
# ---------------------------------------------------------------------


def histogram_boundaries(
    df: DataFrame, col: str, n_buckets: int = 256
) -> list[float]:
    """Freeze bucket boundaries from a sample of the distribution (one
    percentile_approx pass).  Boundaries must be FIXED before partial
    sketches are built — that is what makes per-batch histograms
    mergeable by plain cell addition (the same contract as count-min's
    fixed (depth, width, seed))."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(F.percentile_approx(col, qs, 10_000).alias("b")).collect()[0]["b"]
    uniq: list[float] = []
    for b in row or []:
        b = float(b)
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    return uniq


def histogram_build(df: DataFrame, col: str, boundaries: list[float]) -> DataFrame:
    """Histogram cells ``(bucket int, cnt long)`` for ``df[col]``
    against fixed ``boundaries`` — one map-side-combinable groupBy,
    at most ``len(boundaries)+1`` output rows.  Merge = cell-wise sum
    (see the streaming writer in streaming/sketch.py)."""
    barr = F.lit([float(b) for b in boundaries]).cast("array<double>")
    bucket = F.size(F.filter(barr, lambda b: b < F.col(col).cast("double")))
    return (
        df.where(F.col(col).isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantile(
    sketch: DataFrame, boundaries: list[float], q: float
) -> float:
    """q-quantile estimate from histogram cells: walk the cumulative
    counts to the target rank and return that bucket's upper boundary.
    Error is bounded by one bucket of probability mass (~1/n_buckets
    of the distribution the boundaries were frozen on).  The cell
    frame is <= n_buckets+1 rows — collecting it is a bounded driver
    probe, same contract as the ntile boundary collect."""
    cells = sorted(
        (r["bucket"], r["cnt"]) for r in sketch.collect()
    )
    total = sum(c for _, c in cells)
    if not total:
        raise ValueError("empty sketch")
    target = q * total
    acc = 0
    for b, c in cells:
        acc += c
        if acc >= target:
            return boundaries[min(b, len(boundaries) - 1)]
    return boundaries[-1]
