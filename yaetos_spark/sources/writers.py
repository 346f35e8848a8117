"""Typed output saving — format dispatch, mode policy, layout control.

Behavior parity with the reference's ``save`` (reference:
yaetos/etl_utils.py:595-655): write mode is ``append`` iff the job is
incremental-partitioned or a partition layout is requested, else
``error`` (fail on existing output); ``repartition: N`` compacts
output; a ``_metadata`` sidecar records provenance.

Scale notes: ``partitionBy`` on the incremental field gives partition
pruning to every downstream reader. Compaction uses ``coalesce`` (no
shuffle) when shrinking, ``repartition`` only when a hash layout is
requested. Never ``collect`` — the row-count compaction heuristic the
reference used (count()<500k → repartition(1)) is replaced by AQE
coalescing, which does the same without a second job.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame


def save_output(df: DataFrame, spec: dict, job_name: str = "", now: dt.datetime | None = None) -> None:
    """Write one output spec.

    spec keys: ``path``, ``type`` (parquet/csv/json/orc/txt/None),
    optional ``partition_by`` (list or str), ``mode``, ``repartition``
    (int), ``coalesce`` (int), ``incremental_type``, ``write_kwargs``,
    ``save_metadata``.
    """
    otype = spec.get("type", "parquet")
    if otype in (None, "None", "none"):
        return  # no-output job (reference: yaetos/etl_utils.py:608-610)
    if otype == "redshift":
        from yaetos_spark.sources.jdbc import save_redshift

        save_redshift(df, spec)
        return
    if otype in ("mysql", "clickhouse", "postgres", "oracle", "jdbc"):
        from yaetos_spark.sources.jdbc import save_jdbc

        save_jdbc(df, spec)
        return
    from yaetos_spark.sources.readers import abs_local_path

    path = abs_local_path(spec["path"])

    partition_by = spec.get("partition_by") or spec.get("partitionby")
    if isinstance(partition_by, str):
        partition_by = [partition_by]

    # write-mode policy (reference: yaetos/etl_utils.py:622-623)
    if spec.get("mode"):
        mode = spec["mode"]
    elif spec.get("incremental_type") == "partitioned" or partition_by:
        mode = "append"
    else:
        mode = "error"

    n_re = spec.get("repartition")
    n_co = spec.get("coalesce")
    zorder_by = spec.get("zorder_by")
    if zorder_by:
        # multi-dimensional clustering: Morton-interleave the columns'
        # bit ranks and range-partition + sort on the key, so row-group
        # pruning works for filters on ANY clustered column (see
        # operators/layout.py). The range partition IS this layout
        # job's one shuffle (a repartition/coalesce count becomes its
        # file count); use sort_by for the shuffle-free single-column
        # form.
        from yaetos_spark.operators.layout import zorder_layout

        n = n_re or n_co
        df = zorder_layout(df, list(zorder_by), num_files=int(n) if n else None)
    elif n_re:
        df = df.repartition(int(n_re))
    elif n_co:
        df = df.coalesce(int(n_co))

    sort_by = spec.get("sort_by")
    if sort_by:
        # data-layout clustering: sorting rows WITHIN each output file
        # tightens parquet row-group min/max ranges on the sort columns,
        # so later scans filtered on them skip whole row groups — the
        # poor-man's Z-order, free at write time (no extra shuffle)
        if isinstance(sort_by, str):
            sort_by = [sort_by]
        df = df.sortWithinPartitions(*sort_by)

    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    kwargs = dict(spec.get("write_kwargs") or {})

    if otype == "parquet":
        writer.options(**kwargs).parquet(path)
    elif otype == "orc":
        writer.options(**kwargs).orc(path)
    elif otype == "csv":
        opts = {"header": True}
        opts.update(kwargs)
        writer.options(**opts).csv(path)
    elif otype == "json":
        writer.options(**kwargs).json(path)
    elif otype == "txt":
        writer.text(path)
    elif otype in ("xlsx", "xls", "pickle"):
        _save_pandas_edge(df, otype, path, mode, kwargs)
    else:
        raise ValueError(f"unsupported output type '{otype}'")

    if spec.get("save_metadata"):
        _write_metadata_sidecar(path, job_name, now)


def _save_pandas_edge(df: DataFrame, otype: str, path: str, mode: str, kwargs: dict) -> None:
    """Single-FILE formats (excel / pickle) via a pandas shim at the
    edge (reference: yaetos/etl_utils.py:626-640 ``save_pandas`` with
    to_excel/to_pickle). Small-data contract: Arrow ``toPandas`` to the
    driver by design — these formats exist for humans, not for scale.
    Honors the same mode policy as the distributed writers."""
    if mode == "append":
        # single-file formats can't append; failing loudly beats
        # silently replacing the previous increment's data
        raise ValueError(
            f"mode='append' is not supported for single-file '{otype}' output; "
            "use a directory format (parquet/csv/json) for incremental sinks"
        )
    if os.path.exists(path):
        if mode in ("error", "errorifexists"):
            raise FileExistsError(f"output exists and mode='{mode}': {path}")
        if mode == "ignore":
            return
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    pdf = df.toPandas()
    if otype == "pickle":
        pdf.to_pickle(path, **kwargs)
        return
    try:
        pdf.to_excel(path, index=False, **kwargs)
    except (ImportError, ModuleNotFoundError) as exc:  # no openpyxl in this image
        if kwargs or not str(path).endswith(".xlsx"):
            raise NotImplementedError(
                "excel output beyond plain .xlsx requires openpyxl "
                "(pandas shim at the edge)"
            ) from exc
        from yaetos_spark.sources.xlsx_lite import write_xlsx

        # stdlib fallback: numbers/bools inline, text via sharedStrings,
        # NaN/NaT → blank cells (pandas to_excel parity); numpy scalars
        # → python natives via .item() so the codec's isinstance
        # dispatch sees int/float/bool, not int32/bool_
        def native(v):
            if v is None or v != v:  # NaN/NaT-safe
                return None
            return v.item() if hasattr(v, "item") else v

        rows = [
            tuple(native(v) for v in rec)
            for rec in pdf.itertuples(index=False, name=None)
        ]
        write_xlsx(path, [str(c) for c in pdf.columns], rows)


def _write_metadata_sidecar(path: str, job_name: str, now: dt.datetime | None) -> None:
    """_metadata.txt provenance sidecar (reference: yaetos/etl_utils.py:657-669),
    including git lineage (reference: yaetos/git_utils.py)."""
    from yaetos_spark.git_utils import format_git_lines

    now = now or dt.datetime.now(dt.timezone.utc)
    if "://" in path:
        return  # only local sidecars in v1; S3 via hadoop FS later
    if os.path.isfile(path):
        # single-file output (pickle/xlsx): sidecar goes NEXT TO the
        # file (reference writes path + '_metadata.txt' likewise:
        # yaetos/etl_utils.py:657)
        sidecar = path + "_metadata.txt"
    else:
        os.makedirs(path, exist_ok=True)
        sidecar = os.path.join(path, "_metadata.txt")
    with open(sidecar, "w") as fh:
        fh.write(f"job_name: {job_name}\nsaved_at_utc: {now.isoformat()}\n")
        fh.write(format_git_lines())
