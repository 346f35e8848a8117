"""ExactSubstr dedup job (Lee et al. 2021, arXiv:2107.06499): find
every maximal token span whose length-``k`` windows repeat across the
corpus, and rewrite documents with those spans removed.

``keep: spans`` returns the span inventory instead (audit mode — the
paper reports most duplicated bytes live in a tiny fraction of spans,
so inspecting the inventory before cutting is the normal first run).
See yaetos_spark/operators/dedup.py:duplicated_spans.
"""

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.dedup import duplicated_spans, remove_duplicated_spans


class ExactSubstrJob(SparkJob):
    """params: ``k`` (window length in tokens; the paper uses 50),
    ``min_count`` (occurrences needed to count as duplicated),
    ``cross_doc_only`` (ignore intra-doc repeats), ``keep``
    ('deduped' = rewritten docs, 'spans' = the span inventory)."""

    def transform(self, documents):
        spans = duplicated_spans(
            documents,
            k=int(self.params.get("k", 50)),
            min_count=int(self.params.get("min_count", 2)),
            cross_doc_only=bool(self.params.get("cross_doc_only", False)),
        )
        if self.params.get("keep", "deduped") == "spans":
            return spans
        return remove_duplicated_spans(documents, spans)
