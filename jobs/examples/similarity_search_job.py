"""Embedding similarity search job: top-k cosine neighbors for a set
of query vectors (brute-force exact; swap in lsh_near_dup_pairs /
IVF cells for corpus sizes beyond a broadcastable query side)."""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.similarity import cosine_topk


class SimilaritySearchJob(SparkJob):
    """params: ``k`` (neighbors), ``n_queries`` (first N vec_ids serve
    as the query set; real deployments pass a separate input)."""

    def transform(self, embeddings):
        k = int(self.params.get("k", 10))
        n_queries = int(self.params.get("n_queries", 5))
        queries = embeddings.filter(F.col("vec_id") < n_queries)
        return cosine_topk(embeddings, queries, k=k)
