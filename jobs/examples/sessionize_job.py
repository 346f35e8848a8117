"""Example py_job: gap-based sessionization of the events table
(the batch sessionization pattern the reference builds in ex2 via
first/last window functions — here with the engine operator)."""

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.windows import sessionize


class SessionizeJob(SparkJob):
    def transform(self, events):
        gap = int(self.params.get("gap_seconds", 1800))
        return sessionize(events, key="user_id", ts_col="ts", gap_seconds=gap)
