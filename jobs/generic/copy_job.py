"""Generic copy job — read one input, write it through unchanged.

Behavior parity with the reference's copy job (reference:
jobs/generic/copy_job.py:5-11), minus its count()<500k →
repartition(1) heuristic: an extra count action costs a full pass at
scale; small outputs are compacted by AQE coalescing, or explicitly
with the ``coalesce`` output param.
"""

from yaetos_spark.job import SparkJob


class CopyJob(SparkJob):
    def transform(self, **dfs):
        (df,) = dfs.values()
        return df
