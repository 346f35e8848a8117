"""Generic dataset-compare job — exact fast path, then fuzzy report.

Behavior parity with the reference's compare job (reference:
jobs/generic/compare_job.py:18-84 and compare_pandas_dfs.py:6-97),
Spark-native: ``exceptAll`` both ways for exact equality, then a
single distributed full-outer-join diff keyed by ``pks`` with
per-column numeric thresholds.
"""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.quality import compare_fuzzy, datasets_equal


class CompareJob(SparkJob):
    """params: ``pks`` (the compare join keys), optional
    ``numeric_pct_threshold``. The ``pks`` param keys the comparison —
    it is NOT an output uniqueness constraint, so the framework's
    output-PK gate is disabled here."""

    def output_pks(self):
        return None

    def transform(self, tableA, tableB):
        pks = self.params.get("pks") or ["id"]
        threshold = float(self.params.get("numeric_pct_threshold", 0.01))
        if datasets_equal(tableA, tableB):
            return self.spark.createDataFrame(
                [("identical", 0)], "status string, n_diff_rows long"
            )
        diff = compare_fuzzy(tableA, tableB, pks, numeric_pct_threshold=threshold)
        shared = [c for c in tableA.columns if c in tableB.columns and c not in pks]
        mismatch_any = F.lit(False)
        for c in shared:
            mismatch_any = mismatch_any | ~F.col(c + "_match")
        mismatch_any = mismatch_any | ~F.col("_in_1") | ~F.col("_in_2")
        return diff.filter(mismatch_any)
