"""SemDeDup-style semantic dedup job over an embeddings table: drop
every vector with a smaller-id neighbor at cosine >= ``threshold``
within its cluster, keep the rest (each epsilon-ball keeps its min-id
exemplar).

``n_clusters: 1`` (default) is the exact contract variant — correct
at any corpus a broadcast can hold, and SQL-verifiable. For real
corpora set ``n_clusters ~ sqrt(n)`` (the SemDeDup paper's regime):
k-means cells bound the pairwise scan to within-cluster work, the
documented approximation being that cross-cluster near-pairs are not
examined. See yaetos_spark/operators/similarity.py:semantic_dedup.
"""

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.similarity import semantic_dedup


class SemanticDedupJob(SparkJob):
    """params: ``threshold`` (cosine), ``n_clusters`` (1 = exact,
    >1 = SemDeDup k-means scale path), ``max_cluster_rows`` (hot-
    cluster guard), ``keep`` ('survivors' = surviving rows,
    'dropped_ids' = the ids removed, e.g. to audit a dedup run)."""

    def transform(self, embeddings):
        survivors = semantic_dedup(
            embeddings,
            threshold=float(self.params.get("threshold", 0.95)),
            n_clusters=int(self.params.get("n_clusters", 1)),
            max_cluster_rows=int(self.params.get("max_cluster_rows", 250_000)),
        )
        if self.params.get("keep", "survivors") == "dropped_ids":
            return embeddings.select("vec_id").join(
                survivors.select("vec_id"), "vec_id", "left_anti"
            )
        return survivors
