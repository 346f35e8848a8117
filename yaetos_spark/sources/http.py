"""HTTP/API extraction — driver-side fetch into a DataFrame.

Behavior parity with the reference's extraction jobs (reference:
jobs/examples/ex0_extraction_job.py:10-17, GitHub API pagination loops
jobs/marketing/github_accounts_extraction_job.py:8-24): API extraction
is inherently a driver/edge activity; results land in a Spark
DataFrame immediately so everything downstream distributes. The
fetcher is injectable for tests and for auth/retry policies.
"""

from __future__ import annotations

import gzip
import io
import json

from pyspark.sql import DataFrame, SparkSession


def default_fetcher(url: str, **kwargs) -> bytes:
    import requests

    resp = requests.get(url, timeout=kwargs.get("timeout", 60), headers=kwargs.get("headers"))
    resp.raise_for_status()
    return resp.content


def fetch_json_records(
    spark: SparkSession,
    url: str,
    record_path: str | None = None,
    fetcher=None,
    schema=None,
    **kwargs,
) -> DataFrame:
    """GET a JSON document → DataFrame (one row per record).
    ``record_path`` drills into a wrapper key (e.g. 'records')."""
    raw = (fetcher or default_fetcher)(url, **kwargs)
    data = json.loads(raw)
    if record_path:
        data = data[record_path]
    if not isinstance(data, list):
        data = [data]
    pdf_rows = spark.sparkContext.parallelize([json.dumps(r) for r in data])
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(pdf_rows)


def fetch_csv(
    spark: SparkSession,
    url: str,
    fetcher=None,
    gzipped: bool = False,
    sep: str = ",",
    **kwargs,
) -> DataFrame:
    """GET a (possibly gzip'd) CSV → DataFrame — the reference's ex0
    wiki-dump extraction shape."""
    raw = (fetcher or default_fetcher)(url, **kwargs)
    if gzipped:
        raw = gzip.decompress(raw)
    import pandas as pd

    pdf = pd.read_csv(io.BytesIO(raw), sep=sep)
    return spark.createDataFrame(pdf)


def paged_json_records(
    spark: SparkSession,
    url_template: str,
    max_pages: int = 100,
    fetcher=None,
    record_path: str | None = None,
    **kwargs,
) -> DataFrame:
    """Paginated GET loop ({page} placeholder) unioned into one frame;
    stops on the first empty page."""
    frames = []
    for page in range(1, max_pages + 1):
        raw = (fetcher or default_fetcher)(url_template.format(page=page), **kwargs)
        data = json.loads(raw)
        if record_path:
            data = data[record_path]
        if not data:
            break
        frames.append(spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in data])))
    if not frames:
        raise ValueError("no pages returned any records")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
