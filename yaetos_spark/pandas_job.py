"""Pandas-engine jobs — small-data transforms at the edges.

Behavior parity: the reference runs whole jobs on pandas
(``df_type: 'pandas'``, reference: yaetos/etl_utils.py:374-402,
yaetos/pandas_utils.py) and on Koalas (reference:
jobs/examples/ex8_koalas_job.py). Here Spark stays the only engine;
these shims convert at the job boundary:

- ``PandasJob``: inputs arrive as pandas DataFrames (Arrow-backed
  ``toPandas``), ``transform_pandas`` returns one, converted back to a
  Spark DataFrame for the standard save path. For genuinely small data
  only — the conversion collects to the driver by design.
- ``pandas_on_spark``: the pandas-API-on-Spark bridge (distributed
  pandas syntax over Spark plans) for jobs that want pandas idioms at
  scale — the modern equivalent of the reference's Koalas path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from yaetos_spark.job import SparkJob


class PandasJob(SparkJob):
    """Subclass and override ``transform_pandas(**pdfs) -> pd.DataFrame``."""

    def transform_pandas(self, **pdfs: pd.DataFrame) -> pd.DataFrame:
        raise NotImplementedError

    def transform(self, **dfs: DataFrame) -> DataFrame:
        pdfs = {name: df.toPandas() for name, df in dfs.items()}
        out = self.transform_pandas(**pdfs)
        if out is None:
            return None
        return self.spark.createDataFrame(out)


def pandas_on_spark(df: DataFrame):
    """Spark DataFrame → pandas-on-Spark frame (stays distributed)."""
    return df.pandas_api()
