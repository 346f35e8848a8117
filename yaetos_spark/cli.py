"""CLI launcher — run a registry job, a SQL file, or a dependency tree.

Behavior parity with the reference's Commandliner/Runner
(reference: yaetos/etl_utils.py:1122-1267, jobs/generic/launcher.py):

    python -m yaetos_spark.cli --job_name=my_job [--dependencies]
    python -m yaetos_spark.cli --sql_file=path/to/job.sql
    python -m yaetos_spark.cli new path/to/project  # scaffold a starter tree
"""

from __future__ import annotations

import argparse
import importlib
import re
import sys

from yaetos_spark.job import SparkJob, SqlJob
from yaetos_spark.plans.flow import Flow
from yaetos_spark.plans.registry import Registry
from yaetos_spark.session import get_spark


def _coerce_cmd_value(v: str):
    """Conservative typing for --k=v flags: booleans in ANY case
    (--enable_db_push=false — the string 'false' is truthy and silently
    defeats every boolean gate), none/null, and pure integers.
    DELIBERATELY nothing else: a general literal_eval corrupts
    string-like values ('2024.10' → 2024.1, '1_2' → 12) before path
    templating, which mis-routes data with no error."""
    low = v.strip().lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("none", "null"):
        return None
    if re.fullmatch(r"-?[0-9]+", v.strip()):
        return int(v)
    return v


def job_factory(registry: Registry):
    def make(job_name: str, params: dict) -> SparkJob:
        # py_job wins over sql_file: a job may declare BOTH (the
        # reference's sql_pandas/sql_spark generic jobs take sql_file as
        # a parameter — reference conf/jobs_metadata.yml
        # job_using_generic_template), so sql_file alone implies the
        # default Spark SQL engine only when no py_job names a class
        py_job = params.get("py_job")
        if py_job:
            if ":" in py_job:
                mod_name, _, cls_name = py_job.rpartition(":")
            else:
                mod_name, cls_name = py_job, None
            mod = importlib.import_module(mod_name)
            cls = getattr(mod, cls_name) if cls_name else _find_job_class(mod)
            return cls(params)
        if params.get("sql_file"):
            return SqlJob(params)
        raise ValueError(f"job '{job_name}' has neither sql_file nor py_job")

    return make


def _find_job_class(mod):
    """The job class of a module: a SparkJob subclass DEFINED there
    (imported base classes like PandasJob must not match)."""
    candidates = [
        obj
        for obj in vars(mod).values()
        if isinstance(obj, type) and issubclass(obj, SparkJob) and obj is not SparkJob
    ]
    local = [c for c in candidates if c.__module__ == mod.__name__]
    if local:
        return local[0]
    if candidates:
        return candidates[0]
    raise ValueError(f"no SparkJob subclass in {mod.__name__}")


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "new":
        # project scaffolding (reference: yaetos_cmdline.py `setup`)
        sub = argparse.ArgumentParser(prog="yaetos_spark new")
        sub.add_argument("dir")
        sub.add_argument("--project_name", default=None)
        opts = sub.parse_args(argv[1:])
        from yaetos_spark.scaffold import scaffold_project

        for path in scaffold_project(opts.dir, opts.project_name):
            print(path)
        return 0

    ap = argparse.ArgumentParser(prog="yaetos_spark")
    ap.add_argument("--job_name")
    ap.add_argument("--sql_file")
    ap.add_argument("--registry", default="conf/jobs.yml")
    ap.add_argument("--mode", default=None)
    ap.add_argument("--dependencies", "-x", action="store_true")
    known, unknown = ap.parse_known_args(argv)
    cmd_args = {}
    for tok in unknown:
        if tok.startswith("--") and "=" in tok:
            k, _, v = tok[2:].partition("=")
            cmd_args[k] = _coerce_cmd_value(v)

    spark = get_spark()
    if known.sql_file and not known.job_name:
        job = SqlJob({"sql_file": known.sql_file, **cmd_args})
        out = job.etl(spark)
        if out is not None:
            out.show(20, truncate=False)
        return 0

    registry = Registry.from_file(known.registry)
    params = registry.job_params(known.job_name, mode=known.mode, cmd_args=cmd_args)
    try:
        if known.dependencies:
            flow = Flow(registry)
            out = flow.run_pipeline(spark, known.job_name, job_factory(registry), mode=known.mode, cmd_args=cmd_args)
        else:
            job = job_factory(registry)(known.job_name, params)
            out = job.etl(spark)
    except Exception as exc:
        _notify_failure(known.job_name, params, exc)
        raise
    if out is not None:
        out.show(20, truncate=False)
    return 0


def _notify_failure(job_name: str, params: dict, exc: Exception) -> None:
    """Email the job owners on failure when SMTP is configured
    (reference: yaetos/etl_utils.py:732-755)."""
    owners = params.get("owners")
    smtp_host = params.get("smtp_host")
    if not owners or not smtp_host:
        return
    try:
        from yaetos_spark.alerts import send_failure_email

        send_failure_email(job_name, repr(exc), owners, smtp_host, int(params.get("smtp_port", 25)))
    except Exception:
        pass  # alerting must never mask the real failure


if __name__ == "__main__":
    sys.exit(main())
