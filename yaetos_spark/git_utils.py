"""Run-metadata lineage — capture the git state a job ran from.

Behavior parity: the reference records branch / commit / diff state of
both the framework and the job code at launch and ships it to the
cluster as yaml so a run can always be traced back to exact code
(reference: yaetos/git_utils.py ``Git_Config_Manager``). Here the same
capture feeds the ``_metadata`` sidecar written next to outputs.
"""

from __future__ import annotations

import subprocess


def get_git_config(folder: str = ".") -> dict | None:
    """Branch / commit / dirty-state of the repo at ``folder``; None if
    not a git repo or git is unavailable (capture must never fail a
    job)."""

    def run(*args: str) -> str:
        return (
            subprocess.check_output(["git", *args], cwd=folder, stderr=subprocess.DEVNULL)
            .decode()
            .strip()
        )

    try:
        return {
            "branch": run("rev-parse", "--abbrev-ref", "HEAD"),
            "commit": run("rev-parse", "HEAD"),
            "is_dirty": bool(run("status", "--porcelain")),
        }
    except Exception:
        return None


def format_git_lines(folder: str = ".") -> str:
    """Sidecar-ready lines (empty string when capture unavailable)."""
    cfg = get_git_config(folder)
    if not cfg:
        return ""
    return (
        f"git_branch: {cfg['branch']}\n"
        f"git_commit: {cfg['commit']}\n"
        f"git_dirty: {str(cfg['is_dirty']).lower()}\n"
    )
