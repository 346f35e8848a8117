"""Example pandas-engine job (reference ex7 shape: merge + groupby on
small data at the edge)."""

import pandas as pd

from yaetos_spark.pandas_job import PandasJob


class PandasMergeJob(PandasJob):
    def transform_pandas(self, some_events, other_events):
        df = pd.merge(some_events, other_events, on="user_id", how="inner")
        out = df.groupby("user_id", as_index=False).agg(n=("user_id", "size"))
        return out.sort_values(["n", "user_id"], ascending=[False, True])
