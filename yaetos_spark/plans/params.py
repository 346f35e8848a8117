"""Layered parameter resolution + recursive placeholder substitution.

Behavior parity with the reference's Job_Yml_Parser / Job_Args_Parser
stack (reference: yaetos/etl_utils.py:824-1078): the merged param dict
is built defaults < yml common < mode-specific overlay < job yml
section < programmatic job_args < command-line args, then ``{{key}}``
placeholders are substituted recursively with a depth limit
(reference: yaetos/etl_utils.py:1051-1078).
"""

from __future__ import annotations

import re
from copy import deepcopy

DEFAULTS = {
    "mode": "dev_local",
    "output": {},
    "inputs": {},
    "is_incremental": False,
    "add_created_at": True,
    "save_schemas": False,
    "spark_app_name": "yaetos_spark",
}

_PLACEHOLDER = re.compile(r"\{\{(\w+)\}\}")
_MAX_DEPTH = 10


def merge_params(
    yml_common: dict | None = None,
    mode_specific: dict | None = None,
    job_yml: dict | None = None,
    job_args: dict | None = None,
    cmd_args: dict | None = None,
) -> dict:
    """Layered dict merge, later layers win (scalar overwrite,
    one-level dict merge for inputs/output)."""
    merged = deepcopy(DEFAULTS)
    for layer in (yml_common, mode_specific, job_yml, job_args, cmd_args):
        if not layer:
            continue
        for k, v in layer.items():
            if k in ("inputs", "output") and isinstance(v, dict) and isinstance(merged.get(k), dict):
                sub = dict(merged[k])
                for ik, iv in v.items():
                    if isinstance(iv, dict) and isinstance(sub.get(ik), dict):
                        sub[ik] = {**sub[ik], **iv}
                    else:
                        sub[ik] = deepcopy(iv)
                merged[k] = sub
            else:
                merged[k] = deepcopy(v)
    merged["is_incremental"] = _compute_is_incremental(merged)
    return merged


def _compute_is_incremental(params: dict) -> bool:
    # incremental iff any input declares inc_field or output has one
    # (reference: yaetos/etl_utils.py:1034-1035)
    out = params.get("output") or {}
    if isinstance(out, dict) and out.get("inc_field"):
        return True
    for spec in (params.get("inputs") or {}).values():
        if isinstance(spec, dict) and spec.get("inc_field"):
            return True
    return False


def replace_placeholders(params: dict) -> dict:
    """Recursively substitute {{key}} from top-level scalar params into
    every string value, bounded depth (reference: yaetos/etl_utils.py:1051-1078).

    ``{{latest}}`` and ``{{now}}`` are left for path-expansion time.
    """
    scalars = {k: v for k, v in params.items() if isinstance(v, (str, int, float))}

    def sub_str(s: str) -> str:
        for _ in range(_MAX_DEPTH):
            def repl(m):
                key = m.group(1)
                if key in ("latest", "now"):
                    return m.group(0)
                return str(scalars.get(key, m.group(0)))

            new = _PLACEHOLDER.sub(repl, s)
            if new == s:
                return new
            s = new
        return s

    def walk(v):
        if isinstance(v, str):
            return sub_str(v)
        if isinstance(v, dict):
            return {k: walk(x) for k, x in v.items()}
        if isinstance(v, list):
            return [walk(x) for x in v]
        return v

    return {k: walk(v) for k, v in params.items()}
