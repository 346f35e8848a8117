"""Interactive analysis helpers — query once, cache to disk, reload.

Behavior parity with the reference's analysis toolkit (reference:
yaetos/libs/analysis_toolkit/query_helper.py:7-127): run a SQL query,
drop pickle + csv + a ``.sql`` provenance sidecar next to each other,
and on later calls reload from the pickle instead of re-querying.
Spark-first differences:

- the query runs on the session's SQL engine (registered temp views /
  catalog tables) instead of a driver-side DB connector, so the heavy
  lifting stays distributed; only the RESULT lands in pandas — the
  helper is for human-sized outputs;
- the interactive "overwrite / new name / ignore" prompt is a callback
  (``on_conflict``) so notebooks can pass ``input``-based prompts while
  tests and batch runs stay non-interactive (default: overwrite).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

import pandas as pd
from pyspark.sql import SparkSession


def _filenames(name: str, folder: str) -> tuple[str, str, str, str]:
    if name.endswith(".csv"):
        name = name[:-4]
    base = os.path.join(folder, name)
    return name, base + ".pkl", base + ".csv", base + ".sql"


def query_and_cache(
    spark: SparkSession,
    query_str: str,
    name: str,
    folder: str,
    to_csv_args: dict | None = None,
    force_rerun: bool = False,
    show: bool = False,
    on_conflict: Callable[[str], str] | None = None,
) -> pd.DataFrame:
    """Run ``query_str`` on Spark SQL and cache the result; reload the
    cached pickle on later calls unless ``force_rerun``."""
    name, f_pkl, f_csv, f_sql = _filenames(name, folder)
    if os.path.isfile(f_pkl) and not force_rerun:
        return pd.read_pickle(f_pkl)
    t0 = time.time()
    df = spark.sql(query_str).toPandas()
    elapsed = time.time() - t0
    if show:
        print(df)
    _drop_if_needed(df, name, folder, to_csv_args or {}, elapsed, query_str, on_conflict)
    return df


def process_and_cache(
    name: str,
    folder: str,
    func: Callable[..., pd.DataFrame],
    to_csv_args: dict | None = None,
    force_rerun: bool = False,
    on_conflict: Callable[[str], str] | None = None,
    **func_args,
) -> pd.DataFrame:
    """Same caching contract for an arbitrary pandas-producing callable
    (reference: query_helper.py:26-41)."""
    name, f_pkl, f_csv, f_sql = _filenames(name, folder)
    if os.path.isfile(f_pkl) and not force_rerun:
        return pd.read_pickle(f_pkl)
    t0 = time.time()
    df = func(**func_args)
    elapsed = time.time() - t0
    _drop_if_needed(df, name, folder, to_csv_args or {}, elapsed, f"func:{getattr(func, '__name__', func)}", on_conflict)
    return df


def _drop_if_needed(
    df: pd.DataFrame,
    name: str,
    folder: str,
    to_csv_args: dict,
    elapsed: float,
    query_str: str,
    on_conflict: Callable[[str], str] | None,
) -> None:
    name, f_pkl, f_csv, f_sql = _filenames(name, folder)
    if os.path.isfile(f_pkl):
        prev = pd.read_pickle(f_pkl)
        if prev.equals(df):
            return  # identical result — keep existing files
        choice = on_conflict(f_pkl) if on_conflict else "overwrite"
        if choice == "ignore":
            return
        if choice == "new_name":
            base = os.path.join(folder, name) + "_4debug"
            f_pkl, f_csv, f_sql = base + ".pkl", base + ".csv", base + ".sql"
    _drop_files(df, name, f_pkl, f_csv, f_sql, elapsed, query_str, to_csv_args)


def _drop_files(df, name, f_pkl, f_csv, f_sql, elapsed, query_str, to_csv_args) -> None:
    os.makedirs(os.path.dirname(f_pkl) or ".", exist_ok=True)
    df.to_pickle(f_pkl)
    kwargs = {"sep": ";", "encoding": "utf8", "decimal": "."}
    kwargs.update(to_csv_args)
    df.to_csv(f_csv, **kwargs)
    with open(f_sql, "w") as fh:
        fh.write(
            f"-- name: {name}\n-- engine: spark-sql\n-- time (s): {elapsed:.3f}\n"
            f"-- query:\n{query_str}\n-- end\n"
        )
