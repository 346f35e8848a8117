"""Example py_job: top users by event count from an upstream output.

Demonstrates the framework job surface (reference shape:
jobs/examples/ex1_frameworked_job.py — a transform over named inputs).
"""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob


class TopUsersJob(SparkJob):
    def transform(self, per_type):
        return (
            per_type.groupBy("user_id")
            .agg(F.sum("n").alias("total_events"))
            .orderBy(F.desc("total_events"), F.asc("user_id"))
            .limit(10)
        )
