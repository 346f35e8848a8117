"""End-to-end near-dup dedup pipeline over a documents table:
MinHash-LSH pair generation → connected-components clustering →
one-survivor-per-cluster output."""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.dedup import minhash_lsh_pairs
from yaetos_spark.operators.graph import dedup_clusters


class DedupPipelineJob(SparkJob):
    """params: ``threshold`` (jaccard), ``ngram`` (shingle width),
    ``keep`` ('survivors' = deduped docs, 'clusters' = mapping)."""

    def transform(self, documents):
        threshold = float(self.params.get("threshold", 0.5))
        n = int(self.params.get("ngram", 3))
        pairs = minhash_lsh_pairs(documents, n=n, threshold=threshold).select("id1", "id2")
        clusters = dedup_clusters(documents, pairs)
        if self.params.get("keep", "survivors") == "clusters":
            return clusters
        survivors = clusters.filter(F.col("cluster_id") == F.col("doc_id")).select("doc_id")
        return documents.join(survivors, "doc_id", "left_semi")
