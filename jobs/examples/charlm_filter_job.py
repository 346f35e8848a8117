"""CCNet-style LM quality filter (Wenzek et al. 2019,
arXiv:1911.00359): fit a character n-gram LM on a reference subset of
the input (``ref_lang`` rows play Wikipedia's role) and keep documents
whose perplexity under it is at most ``max_perplexity`` — the absolute
fluency cut, complementing the DSIR (relative importance) and Gopher
(rule heuristic) jobs. See yaetos_spark/operators/text.py.
"""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.text import charlm_fit_score


class CharlmFilterJob(SparkJob):
    """params: ``ref_lang`` (reference-subset filter), ``n`` (gram
    order), ``alpha`` (smoothing), ``max_perplexity`` (keep cut;
    score-less empty docs are always dropped), ``keep`` ('selected' =
    surviving docs with their scores, 'scores' = every doc scored,
    e.g. to pick the cut from the distribution)."""

    def transform(self, documents):
        scores = charlm_fit_score(
            documents,
            F.col("lang") == self.params.get("ref_lang", "en"),
            n=int(self.params.get("n", 3)),
            alpha=float(self.params.get("alpha", 0.1)),
        )
        if self.params.get("keep", "selected") == "scores":
            return scores
        cut = float(self.params.get("max_perplexity", 20.0))
        return documents.join(
            scores.where(F.col("perplexity") <= cut).select(
                "doc_id", "perplexity"
            ),
            "doc_id",
        )
