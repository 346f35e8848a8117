"""Meta-job: run a child job once per region with rewritten paths.

Behavior parity with the reference's multi-region meta job (reference:
jobs/generic/multi_region_meta_job.py:5-24): a driver loop that
re-parameterizes and re-runs a child job per region value, substituting
``{{region}}`` in input/output paths.
"""

from __future__ import annotations

from copy import deepcopy

from yaetos_spark.job import SparkJob


def run_per_region(spark, job_cls, base_params: dict, regions: list[str]):
    """Run ``job_cls`` once per region; returns {region: output_df}."""
    outputs = {}
    for region in regions:
        params = deepcopy(base_params)
        for spec in (params.get("inputs") or {}).values():
            if spec.get("path"):
                spec["path"] = spec["path"].replace("{{region}}", region)
        out_spec = params.get("output") or {}
        if out_spec.get("path"):
            out_spec["path"] = out_spec["path"].replace("{{region}}", region)
        params["region"] = region
        outputs[region] = job_cls(params).etl(spark)
    return outputs


class MultiRegionJob(SparkJob):  # registry-facing wrapper
    """params: ``child_py_job`` (module[:Class]), ``regions`` (list),
    ``child_params`` (dict with {{region}} placeholders)."""

    def transform(self, **dfs):
        import importlib

        py_job = self.params["child_py_job"]
        mod_name, _, cls_name = py_job.partition(":")
        mod = importlib.import_module(mod_name)
        cls = getattr(mod, cls_name) if cls_name else None
        if cls is None:
            from yaetos_spark.cli import _find_job_class

            cls = _find_job_class(mod)
        outputs = run_per_region(
            self.spark, cls, self.params.get("child_params", {}), self.params["regions"]
        )
        # meta-job output: one row per region run
        rows = [(r, df.count() if df is not None else 0) for r, df in outputs.items()]
        return self.spark.createDataFrame(rows, "region string, n_rows long")
