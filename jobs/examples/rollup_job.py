"""Example: maintain a continuous aggregate incrementally.

First run (no ``prev_rollup`` input): builds the rollup from the delta
alone. Subsequent runs: point ``prev_rollup`` at the previous output
(``{{latest}}``) and only the new slice is aggregated and merged —
history is never re-read (see operators/rollup.py).

Params: ``rollup_keys`` (list), ``value_col`` (sum/min/max source).
"""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.rollup import incremental_rollup


class RollupJob(SparkJob):
    def transform(self, delta, prev_rollup=None):
        keys = list(self.params.get("rollup_keys", ["event_type"]))
        val = self.params.get("value_col", "value")
        spec = {
            "n": ("count", None),
            # exact decimal travels through the output parquet so the
            # next maintenance run merges losslessly; `total` (double)
            # is the human-readable companion
            "total_dec": ("sum", "_v_dec"),
            "lo": ("min", val),
            "hi": ("max", val),
        }
        delta = delta.withColumn("_v_dec", F.col(val).cast("decimal(28,6)"))
        if prev_rollup is not None:
            prev_rollup = prev_rollup.select(*keys, "n", "total_dec", "lo", "hi")
        out = incremental_rollup(prev_rollup, delta, keys, spec)
        return out.select(
            *keys, "n", "total_dec",
            F.col("total_dec").cast("double").alias("total"), "lo", "hi",
        )
