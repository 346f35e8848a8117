"""Incremental near-dup dedup as a registry job — the per-batch
production shape: dedup the incoming batch within itself and against
the persisted signature index (operators/dedup.py::
dedup_against_index), appending survivors' signatures for the next
run.  Cost scales with the batch, never with the accumulated corpus.

Pair with the incremental input loop (plans/incremental.py) for a
daily training-data ingest that never re-minhashes history."""

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.dedup import dedup_against_index


class IncrementalDedupJob(SparkJob):
    """params: ``index_dir`` (required — the persisted signature
    index), ``threshold`` (jaccard), ``ngram``, ``num_hashes``,
    ``bands``, ``update_index`` (default True)."""

    def transform(self, documents):
        p = self.params
        return dedup_against_index(
            documents,
            index_dir=p["index_dir"],
            threshold=float(p.get("threshold", 0.5)),
            n=int(p.get("ngram", 3)),
            num_hashes=int(p.get("num_hashes", 16)),
            bands=int(p.get("bands", 4)),
            update_index=bool(p.get("update_index", True)),
        )
