"""Incremental / idempotent loading — periods, watermarks, input filters.

Behavior parity with the reference's multi-pass incremental driver
(reference: yaetos/etl_utils.py:97-137 ``etl_multi_pass``, 290-347
input filtering, 579-593 previous-output watermark probe, 775-801
``Period_Builder``): a job declares ``inc_field`` per input/output; the
driver loops daily periods from the last materialized watermark to
yesterday, filtering each input to the period and appending output.

Scale notes: the watermark probe is a single-column max over the
previous output — with output partitioned by the inc field this is
partition-pruned metadata work, not a full scan. Input period filters
are plain ``df.filter`` on the scan so parquet min/max + partition
pruning keep each increment's I/O proportional to the period, not the
table.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def get_periods(first_day: str, last_day: dt.date | None = None) -> list[str]:
    """Daily 'YYYY-MM-DD' periods from first_day to yesterday inclusive
    (reference: yaetos/etl_utils.py:775-801)."""
    last_day = last_day or (dt.date.today() - dt.timedelta(days=1))
    start = dt.date.fromisoformat(first_day[:10])
    out = []
    while start <= last_day:
        out.append(start.isoformat())
        start += dt.timedelta(days=1)
    return out


def get_output_max_timestamp(spark, path: str, inc_field: str, output_type: str = "parquet"):
    """Watermark of previously-materialized output; None if absent
    (reference: yaetos/etl_utils.py:579-593).

    Absence is an EXPLICIT existence check, never inferred from a
    failed read: a None here means "first run — process everything",
    and incremental jobs append. If an EXISTING output fails to read
    (permissions, corrupt footer, transient FS error), swallowing the
    error would silently re-process the full history INTO the existing
    output — duplicated data, the worst failure mode an incremental
    pipeline has. Raise instead ("raise, don't mislabel")."""
    from yaetos_spark.plans.paths import dataset_exists

    if not dataset_exists(path, spark):
        return None
    if output_type == "csv":
        prev = spark.read.option("header", True).csv(path)
    else:
        prev = spark.read.parquet(path)
    if inc_field not in prev.columns:
        return None
    return prev.agg(F.max(inc_field).alias("m")).collect()[0]["m"]


def filter_incremental_inputs(
    inputs: dict[str, DataFrame],
    specs: dict[str, dict],
    period: str | None = None,
    min_exclusive=None,
    max_inclusive=None,
) -> dict[str, DataFrame]:
    """Apply per-input inc_field predicates (reference:
    yaetos/etl_utils.py:290-347).

    Either a single ``period`` day (equality on the date of inc_field)
    or an (min_exclusive, max_inclusive] watermark range.
    """
    out = {}
    for name, df in inputs.items():
        spec = specs.get(name) or {}
        inc = spec.get("inc_field")
        if not inc:
            out[name] = df
            continue
        if period is not None:
            df = df.filter(F.to_date(F.col(inc)) == F.lit(period))
        else:
            if min_exclusive is not None:
                df = df.filter(F.col(inc) > F.lit(min_exclusive))
            if max_inclusive is not None:
                df = df.filter(F.col(inc) <= F.lit(max_inclusive))
        out[name] = df
    return out


def multi_pass_loop(
    first_day: str,
    last_day,
    watermark,
    rerun_criteria: str,
    run_period,
) -> list[str]:
    """The PURE rerun-criteria state machine — extracted from
    :func:`run_multi_pass` so the loop's termination/skip behavior is
    property-testable without Spark I/O (SURVEY §7.3 flags the
    reference's own documented pitfalls here: ``last_date`` looping
    past missing days, ``output_empty`` stalling on legitimately-empty
    days — reference yaetos/etl_utils.py:126-131).

    ``watermark`` is the max inc-field value already materialized (or
    None on first build); ``run_period(period) -> bool`` executes one
    period and returns whether its output was empty.
    """
    start = first_day
    if rerun_criteria in ("last_date", "both") and watermark is not None:
        last_date = dt.date.fromisoformat(str(watermark)[:10]) + dt.timedelta(days=1)
        start = max(start, last_date.isoformat())
    processed = []
    for period in get_periods(start, last_day):
        is_empty = run_period(period)
        processed.append(period)
        if is_empty and rerun_criteria in ("output_empty", "both"):
            break
    return processed


def run_multi_pass(
    spark,
    make_job,
    first_day: str,
    last_day=None,
    rerun_criteria: str = "last_date",
):
    """The incremental driver loop (reference: yaetos/etl_utils.py:97-137
    ``etl_multi_pass``): replay daily periods from the last materialized
    watermark (or ``first_day`` on the first build) up to yesterday,
    running one idempotent append per period.

    ``make_job(period: str) -> SparkJob`` builds a job configured for
    one period (the job's output spec should append — partitioned by
    the inc field for pruning). ``rerun_criteria``:

    - ``last_date``: next run starts after max(inc_field) of existing
      output (empty days are skipped forever — the reference documents
      this pitfall for gappy data).
    - ``output_empty``: stop the loop at the first empty period so it
      is retried next run (stalls on legitimately-empty days — also a
      documented reference pitfall).
    - ``both``: start from the watermark but stop on empty.

    Returns the list of periods actually processed.
    """
    probe_job = make_job(first_day)
    out_spec = probe_job.output_spec()
    inc_field = out_spec.get("inc_field")
    watermark = None
    if rerun_criteria in ("last_date", "both") and inc_field and out_spec.get("path"):
        watermark = get_output_max_timestamp(
            spark, out_spec["path"], inc_field, out_spec.get("type", "parquet")
        )

    def run_period(period: str) -> bool:
        job = make_job(period)
        out = job.etl(spark)
        is_empty = out is None or out.isEmpty()
        if out is not None:
            out.unpersist()
        return is_empty

    return multi_pass_loop(first_day, last_day, watermark, rerun_criteria, run_period)


def min_of_max_timestamps(inputs: dict[str, DataFrame], specs: dict[str, dict]):
    """Min across inputs of each input's max(inc_field) — the safe
    upper watermark when inputs arrive at different speeds
    (reference "motm": yaetos/etl_utils.py:305-313)."""
    maxes = []
    for name, df in inputs.items():
        inc = (specs.get(name) or {}).get("inc_field")
        if inc:
            m = df.agg(F.max(inc).alias("m")).collect()[0]["m"]
            if m is not None:
                maxes.append(m)
    return min(maxes) if maxes else None
