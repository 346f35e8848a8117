"""YAML job registry — the declarative manifest of jobs and datasets.

Behavior parity with the reference's jobs_metadata.yml model
(reference: conf/jobs_metadata.yml, parsed by Job_Yml_Parser,
yaetos/etl_utils.py:824-922): a ``jobs:`` map keyed by job name, each
entry declaring ``py_job`` or ``sql_file``, ``inputs``, ``output``,
``dependencies``, plus a ``common_params`` section with
``all_mode_params`` and ``mode_specific_params`` overlays.
"""

from __future__ import annotations

import yaml

from yaetos_spark.plans.params import merge_params, replace_placeholders


class Registry:
    def __init__(self, manifest: dict):
        self.jobs: dict = manifest.get("jobs", {}) or {}
        common = manifest.get("common_params", {}) or {}
        self.all_mode_params: dict = common.get("all_mode_params", {}) or {}
        self.mode_specific_params: dict = common.get("mode_specific_params", {}) or {}

    @classmethod
    def from_file(cls, path: str) -> "Registry":
        with open(path) as fh:
            return cls(yaml.safe_load(fh) or {})

    def job_names(self) -> list[str]:
        return list(self.jobs)

    def job_params(
        self,
        job_name: str,
        mode: str | None = None,
        job_args: dict | None = None,
        cmd_args: dict | None = None,
    ) -> dict:
        """Fully-resolved param dict for one job (layered + placeholders)."""
        if job_name not in self.jobs:
            raise KeyError(f"job '{job_name}' not in registry ({sorted(self.jobs)})")
        job_yml = self.jobs[job_name] or {}
        mode = mode or (cmd_args or {}).get("mode") or (job_args or {}).get("mode") \
            or self.all_mode_params.get("mode", "dev_local")
        # comma-separated multi-mode: overlays apply left-to-right, later
        # modes win (reference: Job_Yml_Parser with yml_modes
        # 'dev_EMR,your_extra_tenant', etl_utils_test.py test_set_modes)
        mode_overlay: dict = {}
        for m in str(mode).split(","):
            mode_overlay.update(self.mode_specific_params.get(m.strip(), {}) or {})
        params = merge_params(self.all_mode_params, mode_overlay, job_yml, job_args, cmd_args)
        params["job_name"] = job_name
        params["mode"] = mode
        return replace_placeholders(params)

    def dependencies(self, job_name: str) -> list[str]:
        deps = (self.jobs.get(job_name) or {}).get("dependencies") or []
        return list(deps)
