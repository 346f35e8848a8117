"""No-op placeholder job.

Behavior parity with the reference's dummy job (reference:
jobs/generic/dummy_job.py:4-6): transform returns None, producing no
output — used as a scheduling placeholder / DAG anchor node that
dependencies can hang off before the real job exists.
"""

from yaetos_spark.job import SparkJob


class DummyJob(SparkJob):
    def input_specs(self):
        return {}

    def transform(self, **dfs):
        return None
