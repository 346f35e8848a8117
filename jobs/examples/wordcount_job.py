"""Wordcount over a text input — the reference's canonical example
(reference: jobs/examples/wordcount_frameworked_job.py, an RDD
reduceByKey), as a DataFrame plan with map-side combine."""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob


class WordcountJob(SparkJob):
    def transform(self, lines):
        # a 'txt' input arrives as one 'value' column; tabular inputs
        # can point text_col at any string column
        col = self.params.get("text_col", "value")
        return (
            lines.select(F.explode(F.split(F.trim(F.col(col)), r"\s+")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("word"))
        )
