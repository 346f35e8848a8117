"""DSIR data-selection job (Xie et al. 2023, arXiv:2302.03169): score
every document by its hashed n-gram importance log-weight against a
target domain, then keep the top ``fraction`` by weight.

``target_lang`` defines the target domain (the paper's p); the raw
pool q is the whole input.  ``seed`` switches the selection from
greedy top-k to the paper's Gumbel-top-k importance RESAMPLE —
deterministic given the seed, so a rerun reproduces the same sample.
See yaetos_spark/operators/curation.py:dsir_logweights / dsir_select.
"""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.curation import dsir_logweights, dsir_select


class DsirSelectJob(SparkJob):
    """params: ``target_lang`` (target-domain filter), ``fraction``
    (share of docs to keep), ``n_buckets`` / ``alpha`` (hashed-ngram
    fit), ``seed`` (None = greedy top-k; int = Gumbel resample),
    ``keep`` ('selected' = surviving docs joined back to their text,
    'scores' = every doc's weight + selected flag, e.g. to audit the
    cut point)."""

    def transform(self, documents):
        scores = dsir_logweights(
            documents,
            F.col("lang") == self.params.get("target_lang", "en"),
            n_buckets=int(self.params.get("n_buckets", 10_000)),
            alpha=float(self.params.get("alpha", 1.0)),
        )
        seed = self.params.get("seed")
        flagged = dsir_select(
            scores,
            fraction=float(self.params.get("fraction", 0.5)),
            seed=int(seed) if seed is not None else None,
        )
        if self.params.get("keep", "selected") == "scores":
            return flagged
        return (
            flagged.filter("selected")
            .select("doc_id", "dsir_logweight")
            .join(documents, "doc_id")
        )
