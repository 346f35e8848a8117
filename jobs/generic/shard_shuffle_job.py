"""Generic training-shard shuffle job: deterministically permute the
input into ``n_shards`` evenly-sized, hash-ordered shards so that
sequential epoch readers see a well-shuffled, reproducible sequence
(same input + same salt = identical shards on any cluster). Typically
the LAST stage of a corpus pipeline, after mixing/tokenization.
See yaetos_spark/operators/layout.py:shuffle_shards.
"""

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.layout import shuffle_shards


class ShardShuffleJob(SparkJob):
    """params: ``n_shards``, ``id_col`` (unique row id the permutation
    hashes), ``salt`` (vary per epoch to re-permute without touching
    the data)."""

    def transform(self, **dfs):
        (df,) = dfs.values()
        return shuffle_shards(
            df,
            id_col=self.params.get("id_col", "doc_id"),
            n_shards=int(self.params.get("n_shards", 64)),
            salt=str(self.params.get("salt", "")),
        )
