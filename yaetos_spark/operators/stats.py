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
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    # The exact num/den can exceed 2^53, and decimal->double casting of
    # such values is NOT identically rounded across engines (DuckDB
    # double-rounds int128-scaled decimals; observed 1-ulp slope drift
    # at sf0.1). Shrink BOTH by the same integer divisor until they fit
    # a double's mantissa: all ops below are exact integer arithmetic
    # any engine reproduces verbatim, the doubles are then cast
    # losslessly, and the single float division rounds identically.
    # Costs ~1e-11 relative accuracy; buys bit-identical results.
    # DIV truncates toward zero in Spark but floors in DuckDB, so the
    # numerator (the only possibly-negative term) divides sign-split.
    agg = agg.withColumn("_num", num).withColumn("_den", den)
    num_red = F.signum(F.col("_num")).cast("long") * F.expr(
        "abs(_num) div (1 + greatest(abs(_num), _den) div 9007199254740992)"
    )
    den_red = F.expr("_den div (1 + greatest(abs(_num), _den) div 9007199254740992)")
    slope = F.when(F.col("_den") != 0, num_red.cast("double") / den_red.cast("double"))
    # The intercept (Sy - slope*Sx)/n has the same decimal->double
    # hazard on Sx/Sy themselves once |sum| crosses 2^53: shrink both
    # by ONE common integer divisor (sign-split so Spark's truncating
    # div matches DuckDB's floor on negatives), cast the now-lossless
    # doubles, and scale back by the exactly-representable divisor.
    # Identity (divisor 1) until sums actually cross the boundary.
    agg = agg.withColumn(
        "_d2", F.expr("1 + greatest(abs(_sx), abs(_sy)) div 9007199254740992")
    )
    sx_red = F.signum(F.col("_sx")).cast("long") * F.expr("abs(_sx) div _d2")
    sy_red = F.signum(F.col("_sy")).cast("long") * F.expr("abs(_sy) div _d2")
    intercept = (
        (sy_red.cast("double") - slope * sx_red.cast("double"))
        / F.col("n")
        * F.col("_d2").cast("double")
    )
    return agg.select(*keys, "n", slope.alias("slope"), intercept.alias("intercept"))


def spearman_per_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation via grouped-map
    ``applyInPandas`` — the UDAF surface (SURVEY §2.12): whole-group
    logic that aggregate functions can't express lands as one pandas
    function per group, Arrow-batched.

    Bit-identical across engines despite being rank-based: average
    ranks with ties are halves, so DOUBLED ranks are integers; every
    sum is exact integer arithmetic and only the final
    ``num / sqrt(da * db)`` runs in floating point — the same three
    IEEE ops the oracle's SQL performs, so even the DuckDB value hash
    matches.  Returns ``(group, n, rho)``; rho is NULL for degenerate
    groups (all ties in either variable).

    Scale contract: grouped-map semantics — each GROUP must fit one
    worker (the inherent applyInPandas shape).  For unbounded groups
    use the aggregate-only :func:`ols_per_group` family instead.
    """
    import math

    import pandas as pd

    gtype = dict(df.dtypes)[group_col]
    schema = f"{group_col} {gtype}, n long, rho double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        # average ranks doubled -> exact integers (ties make .5 ranks)
        rx2 = (2 * pdf[x_col].rank(method="average")).round().astype("int64")
        ry2 = (2 * pdf[y_col].rank(method="average")).round().astype("int64")
        sx, sy = int(rx2.sum()), int(ry2.sum())
        sxy = int((rx2 * ry2).sum())
        sxx = int((rx2 * rx2).sum())
        syy = int((ry2 * ry2).sum())
        num = n * sxy - sx * sy
        da, db = n * sxx - sx * sx, n * syy - sy * sy
        rho = float(num) / math.sqrt(float(da) * float(db)) if da and db else None
        return pd.DataFrame(
            [(pdf[group_col].iloc[0], n, rho)], columns=[group_col, "n", "rho"]
        )

    return df.select(group_col, x_col, y_col).groupBy(group_col).applyInPandas(fit, schema)
