"""Generic small-file compaction job — rewrite a dataset into
right-sized files.

The operational reality of incremental pipelines at 100 TB: every
micro-batch / period append leaves small files, and scan cost degrades
with file count (task-per-file scheduling, footer reads). This job
rewrites a dataset targeting ``target_file_bytes`` per output file,
sizing the partition count from the INPUT'S ACTUAL BYTES (filesystem
metadata — no data pass, unlike the reference's count()-based
heuristic, reference: yaetos/etl_utils.py copy/repartition logic).

Sort-within by an optional ``cluster_by`` column so min/max row-group
stats stay tight for data-skipping readers.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_file_count(input_bytes: int, target_file_bytes: int) -> int:
    """ceil(bytes/target), at least 1 — pure helper, unit-testable."""
    return max(1, -(-input_bytes // max(1, target_file_bytes)))


class CompactJob(SparkJob):
    """params: ``target_file_bytes`` (default 128 MiB), optional
    ``cluster_by`` — one column sorts within partitions (shuffle-free);
    two or more Z-order the rewrite (operators/layout.py: the
    compaction shuffle doubles as the clustering shuffle, so
    multi-dimensional data skipping costs nothing extra here)."""

    def transform(self, **dfs):
        (df,) = dfs.values()
        target = int(self.params.get("target_file_bytes", 128 * 1024 * 1024))
        (spec,) = self.params["inputs"].values()
        path = spec.get("path", "")
        n_files = (
            plan_file_count(_tree_bytes(path), target)
            if path and "://" not in path and os.path.exists(path)
            else None
        )
        cluster_by = self.params.get("cluster_by")
        if isinstance(cluster_by, str):
            cluster_by = [cluster_by]
        if cluster_by and len(cluster_by) >= 2:
            from yaetos_spark.operators.layout import zorder_layout

            return zorder_layout(df, cluster_by, num_files=n_files)
        if n_files is not None:
            df = df.repartition(n_files)
        if cluster_by:
            df = df.sortWithinPartitions(F.col(cluster_by[0]))
        return df
