"""API extraction job — registry-driven HTTP pull into a DataFrame.

Behavior parity with the reference's extraction example (reference:
jobs/examples/ex0_extraction_job.py:9-15): the job declares no tabular
inputs; instead ``api_inputs: {path: <url>, ...}`` names the endpoint,
and the fetched payload (CSV, optionally gzipped, or JSON records)
lands as a Spark DataFrame so everything downstream distributes.
The fetcher is injectable (param ``fetcher``) for offline tests and
auth/retry policies — network only happens when a real URL is run.
"""

from __future__ import annotations

from yaetos_spark.job import SparkJob
from yaetos_spark.sources.http import fetch_csv, fetch_json_records


class ExtractionJob(SparkJob):
    def input_specs(self):
        return {}

    def transform(self, **dfs):
        spec = self.params["api_inputs"]
        url = spec["path"]
        fetcher = self.params.get("fetcher")  # injectable for tests
        fmt = spec.get("format", "csv")
        if fmt == "json":
            return fetch_json_records(
                self.spark, url, record_path=spec.get("record_path"), fetcher=fetcher
            )
        return fetch_csv(
            self.spark, url, gzipped=spec.get("gzipped", url.endswith(".gz")), fetcher=fetcher
        )
