"""Deterministic distributed statistics: per-group OLS regression.

Drift detection over a 100 TB metric stream ("is this feature's value
trending?") is a per-group simple regression. Spark's built-in
regr_slope sums doubles in shuffle order, so the low bits change
run-to-run; like operators/graph.py:pagerank_fixed_point, this module
gets bit-identical, oracle-checkable results by doing all SUMS in
exact arithmetic (integer-valued doubles summed as DECIMAL(38,0)) and
only the final slope/intercept division in floating point on
identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,0)"


def ols_per_group(
    df: DataFrame,
    keys: list[str],
    x_int: "F.Column",
    y_int: "F.Column",
) -> DataFrame:
    """Exact simple linear regression of ``y_int`` on ``x_int`` per
    group, where both inputs must be INTEGER-VALUED columns (cast or
    quantize upstream — e.g. epoch seconds and cents). Returns
    (keys..., n, slope, intercept) with slope/intercept in the given
    integer units.

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), every sum exact in
    DECIMAL(38,0): associative, so shuffle order cannot perturb the
    result, and a DuckDB oracle over the same formula matches
    bit-for-bit. One map-side-combined aggregation — the classic
    one-pass sufficient-statistics pattern; no second scan, no window.
    Groups with < 2 points or zero x-variance yield NULL slope.
    """
    # cross-products in DECIMAL from the start: epoch-seconds x cents
    # already overflows a LONG product (1.7e9 * 6e9 > 2^63), which
    # would throw under ANSI mode or silently wrap without it
    x = x_int.cast("long").cast(DEC)
    y = y_int.cast("long").cast(DEC)
    agg = df.select(
        *[F.col(k) for k in keys],
        x.alias("_x"),
        y.alias("_y"),
        (x * y).alias("_xy"),
        (x * x).alias("_xx"),
    ).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x").cast(DEC)).alias("_sx"),
        F.sum(F.col("_y").cast(DEC)).alias("_sy"),
        F.sum(F.col("_xy").cast(DEC)).alias("_sxy"),
        F.sum(F.col("_xx").cast(DEC)).alias("_sxx"),
    )
    n = F.col("n").cast(DEC)
    num = (n * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    den = (n * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    slope = F.when(den != 0, num / den)
    intercept = (
        F.col("_sy").cast("double") - slope * F.col("_sx").cast("double")
    ) / F.col("n")
    return agg.select(*keys, "n", slope.alias("slope"), intercept.alias("intercept"))
