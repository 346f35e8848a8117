"""Data-quality primitives — PK checks and dataset compare, Spark-native.

Behavior parity: ``check_pk`` (count vs distinct-count, reference:
yaetos/spark_utils.py:32-40), ``identify_non_unique_pks`` (window count
over the key, reference: yaetos/spark_utils.py:16-21), and the dataset
compare job (exact hash equality then fuzzy per-column outer-join diff,
reference: jobs/generic/compare_job.py:18-84 and
yaetos/libs/analysis_toolkit/compare_pandas_dfs.py:6-97) — rebuilt on
DataFrame ops so they distribute.

Scale notes: check_pk is two aggregations over one shuffle each;
identify_non_unique_pks is a map-side-combining groupBy-count joined
back to the rows (a window by key would single-task a hot PK). The exact
compare uses ``exceptAll`` both ways (hash-based set difference — no
driver-side hashing of the whole dataset like the reference's
sha256-over-pandas). The fuzzy compare is a single full-outer join on
the PK, all per-column deltas evaluated JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yaetos_spark.operators._guards import reserve_helper_cols


def check_pk(df: DataFrame, pks: list[str]) -> bool:
    """True iff ``pks`` uniquely identify rows (reference:
    yaetos/spark_utils.py:32-40)."""
    cnt = df.count()
    distinct_cnt = df.select(*pks).dropDuplicates().count()
    return cnt == distinct_cnt


def identify_non_unique_pks(df: DataFrame, pks: list[str]) -> DataFrame:
    """Rows whose PK occurs more than once (reference:
    yaetos/spark_utils.py:16-21).

    groupBy-count + equi-join back, not a count-over-window: the
    window ships every row of a PK group to ONE task, and a
    pathologically duplicated key (a null-ish default value repeated
    10^9 times) is exactly what this diagnostic exists to find — the
    groupBy combines map-side and AQE can skew-split the join probe,
    so the hot key distributes. Output rows and column order are
    identical to the window formulation."""
    counts = (
        df.groupBy(*[F.col(c) for c in pks])
        .agg(F.count(F.lit(1)).alias("_pk_count"))
        .filter(F.col("_pk_count") >= 2)
    )
    return df.join(counts, pks, "inner").select(*df.columns, "_pk_count")


def datasets_equal(df1: DataFrame, df2: DataFrame) -> bool:
    """Exact multiset equality via exceptAll both directions."""
    if set(df1.columns) != set(df2.columns):
        return False
    df2 = df2.select(*df1.columns)
    return df1.exceptAll(df2).isEmpty() and df2.exceptAll(df1).isEmpty()


def compare_fuzzy(
    df1: DataFrame,
    df2: DataFrame,
    pk: list[str],
    numeric_pct_threshold: float = 0.01,
) -> DataFrame:
    """Full-outer-join diff report keyed by ``pk``.

    Returns one row per PK with ``_in_1``/``_in_2`` presence flags and,
    per shared non-key column c, ``c_1``, ``c_2`` and ``c_match``
    (numeric: |a-b|/|a| * 100 <= threshold with 0/NULL handling;
    other types: equality). Mirrors the reference's fuzzy compare
    (compare_pandas_dfs.py:31-97) as one distributed join.
    """
    shared = [c for c in df1.columns if c in df2.columns and c not in pk]
    numeric_types = ("int", "bigint", "double", "float", "decimal", "smallint", "tinyint", "long")
    d1 = df1.select(*pk, *[F.col(c).alias(c + "_1") for c in shared])
    d2 = df2.select(*pk, *[F.col(c).alias(c + "_2") for c in shared])
    reserve_helper_cols("compare_fuzzy", ("_in_1", "_in_2"), d1, d2)
    d1 = d1.withColumn("_in_1", F.lit(True))
    d2 = d2.withColumn("_in_2", F.lit(True))
    joined = d1.join(d2, on=pk, how="full_outer")
    joined = joined.withColumn("_in_1", F.coalesce("_in_1", F.lit(False)))
    joined = joined.withColumn("_in_2", F.coalesce("_in_2", F.lit(False)))
    dtypes1 = dict(df1.dtypes)
    for c in shared:
        a, b = F.col(c + "_1"), F.col(c + "_2")
        if any(t in dtypes1[c] for t in numeric_types):
            delta_pct = F.when(a.isNull() & b.isNull(), F.lit(0.0)) \
                .when(a.isNull() | b.isNull(), F.lit(100.0)) \
                .when(a == 0, F.when(b == 0, F.lit(0.0)).otherwise(F.lit(100.0))) \
                .otherwise(F.abs((a - b) / a) * 100)
            joined = joined.withColumn(c + "_match", delta_pct <= F.lit(numeric_pct_threshold))
        else:
            joined = joined.withColumn(c + "_match", a.eqNullSafe(b))
    return joined


def run_expectations(df: DataFrame, rules: list[dict]) -> tuple[bool, DataFrame]:
    """Declarative data-quality gate — one aggregation pass for any
    number of rules (beyond the reference, which only had check_pk).

    Each rule is a dict with ``check`` and its params:

    - {"check": "not_null", "column": c}
    - {"check": "unique", "columns": [c, ...]}
    - {"check": "in_range", "column": c, "min": x, "max": y}
    - {"check": "in_set", "column": c, "values": [...]}
    - {"check": "matches", "column": c, "pattern": regex}
    - {"check": "min_rows", "n": k}

    Returns (all_passed, report_df) where report_df has one row per
    rule: (check, column, failed_count, passed). Everything evaluates
    in ONE job — rules become conditional-count aggregate columns.
    """
    aggs = []
    meta = []
    for i, rule in enumerate(rules):
        kind = rule["check"]
        col = rule.get("column") or ",".join(rule.get("columns", []) or [])
        if kind == "not_null":
            bad = F.sum(F.when(F.col(rule["column"]).isNull(), 1).otherwise(0))
        elif kind == "in_range":
            c = F.col(rule["column"])
            cond = c.isNull()
            if "min" in rule:
                cond = cond | (c < rule["min"])
            if "max" in rule:
                cond = cond | (c > rule["max"])
            bad = F.sum(F.when(cond, 1).otherwise(0))
        elif kind == "in_set":
            # NULL fails by default (NULL ~isin(...) is NULL, which
            # F.when treats as false — count it explicitly); set
            # allow_null: true to let NULLs pass
            cond = ~F.col(rule["column"]).isin(rule["values"])
            if not rule.get("allow_null"):
                cond = cond | F.col(rule["column"]).isNull()
            bad = F.sum(F.when(cond, 1).otherwise(0))
        elif kind == "matches":
            cond = ~F.col(rule["column"]).rlike(rule["pattern"])
            if not rule.get("allow_null"):
                cond = cond | F.col(rule["column"]).isNull()
            bad = F.sum(F.when(cond, 1).otherwise(0))
        elif kind == "min_rows":
            bad = F.when(F.count(F.lit(1)) < rule["n"], 1).otherwise(0)
        elif kind == "unique":
            # distinct-count needs its own aggregate shape
            bad = (F.count(F.lit(1)) - F.count_distinct(
                F.concat_ws("\x00", *[F.col(c).cast("string") for c in rule["columns"]])
            ))
        else:
            raise ValueError(f"unknown expectation '{kind}'")
        aggs.append(bad.cast("long").alias(f"_r{i}"))
        meta.append((kind, col))
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    report_rows = [
        (kind, col, int(row[f"_r{i}"]), int(row[f"_r{i}"]) == 0)
        for i, (kind, col) in enumerate(meta)
    ]
    report = spark.createDataFrame(
        report_rows, "check string, column string, failed_count long, passed boolean"
    )
    return all(r[3] for r in report_rows), report


def compare_summary(diff: DataFrame, shared_cols: list[str]) -> dict:
    """Aggregate a compare_fuzzy report into counts (driver-side dict)."""
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("_in_1") & ~F.col("_in_2"), 1).otherwise(0)).alias("only_in_1"),
        F.sum(F.when(F.col("_in_2") & ~F.col("_in_1"), 1).otherwise(0)).alias("only_in_2"),
    ]
    for c in shared_cols:
        aggs.append(F.sum(F.when(~F.col(c + "_match"), 1).otherwise(0)).alias(c + "_mismatches"))
    return diff.agg(*aggs).collect()[0].asDict()


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    ndv_rsd: float = 0.05,
) -> DataFrame:
    """One-pass column profile: one output row per column with row
    count, non-null count, null fraction, approximate distinct count
    (HLL, relative error ``ndv_rsd``), min/max (string repr), average
    length (strings/binary) or element count (arrays/maps), and
    mean/stddev for numerics.

    The planning pass a pipeline runs before sizing a 100 TB job: NDV
    per key column picks the shuffle partition count, null fractions
    flag columns to prune, and min/max bound partition predicates. All
    columns profile in ONE aggregation job (partial map-side combine,
    no shuffle of data rows, one scan) — not a per-column loop like
    pandas-style profilers, so cost is a single pass regardless of
    column count. Extends the reference's per-column ``describe``
    usage (reference: yaetos/etl_utils.py analysis helpers) to an
    engine-level primitive.
    """
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    n_rows = F.count(F.lit(1))
    aggs = [n_rows.alias("_n")]
    per_col: list[dict] = []
    for i, f in enumerate(fields):
        c = F.col(f.name)
        t = f.dataType.simpleString()
        spec = {"name": f.name, "type": t}
        aggs.append(F.count(c).alias(f"_nn{i}"))
        # HLL hashes atomic/array/struct values; maps are unhashable
        if not t.startswith("map"):
            aggs.append(F.approx_count_distinct(c, ndv_rsd).alias(f"_ndv{i}"))
            spec["ndv"] = True
        # min/max need an ordering; maps have none
        if not t.startswith("map"):
            aggs.append(F.min(c).cast("string").alias(f"_min{i}"))
            aggs.append(F.max(c).cast("string").alias(f"_max{i}"))
            spec["minmax"] = True
        if t in ("string", "binary"):
            aggs.append(F.avg(F.length(c)).alias(f"_len{i}"))
            spec["len"] = True
        elif t.startswith(("array", "map")):
            aggs.append(F.avg(F.size(c)).alias(f"_len{i}"))
            spec["len"] = True
        if t in ("tinyint", "smallint", "int", "bigint", "float", "double") or t.startswith(
            "decimal"
        ):
            aggs.append(F.avg(c).cast("double").alias(f"_mean{i}"))
            aggs.append(F.stddev(c).cast("double").alias(f"_std{i}"))
            spec["moments"] = True
        per_col.append(spec)
    wide = df.agg(*aggs)
    # reshape the single wide row to long form without leaving Spark:
    # one struct per column, exploded
    null_d = F.lit(None).cast("double")
    null_l = F.lit(None).cast("long")
    null_s = F.lit(None).cast("string")
    structs = []
    for i, spec in enumerate(per_col):
        nn = F.col(f"_nn{i}")
        structs.append(
            F.struct(
                F.lit(spec["name"]).alias("column"),
                F.lit(spec["type"]).alias("data_type"),
                F.col("_n").alias("n_rows"),
                nn.alias("n_nonnull"),
                F.when(F.col("_n") > 0, 1.0 - nn / F.col("_n"))
                .otherwise(null_d)
                .alias("null_frac"),
                (F.col(f"_ndv{i}") if spec.get("ndv") else null_l).alias("approx_ndv"),
                (F.col(f"_min{i}") if spec.get("minmax") else null_s).alias("min_value"),
                (F.col(f"_max{i}") if spec.get("minmax") else null_s).alias("max_value"),
                (F.col(f"_len{i}") if spec.get("len") else null_d).alias("avg_length"),
                (F.col(f"_mean{i}") if spec.get("moments") else null_d).alias("mean"),
                (F.col(f"_std{i}") if spec.get("moments") else null_d).alias("stddev"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema-drift report between two snapshots of a dataset: one row
    per (column, change) where change is 'added', 'removed', or
    'type_changed' (old_type/new_type filled accordingly). Empty
    result = schemas identical (order-insensitive). Metadata-only —
    no data is read; safe to run on 100 TB tables.

    The check an incremental pipeline runs before appending a new
    period: a silently-widened column upstream (int -> string) breaks
    the union downstream, and append-mode writes won't flag it.
    """
    old_types = {f.name: f.dataType.simpleString() for f in old.schema}
    new_types = {f.name: f.dataType.simpleString() for f in new.schema}
    rows = []
    for name in sorted(set(old_types) | set(new_types)):
        o, n = old_types.get(name), new_types.get(name)
        if o is None:
            rows.append((name, "added", None, n))
        elif n is None:
            rows.append((name, "removed", o, None))
        elif o != n:
            rows.append((name, "type_changed", o, n))
    return old.sparkSession.createDataFrame(
        rows, "column string, change string, old_type string, new_type string"
    )
