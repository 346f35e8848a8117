"""Gopher-style quality filtering as a registry job — stage 2 of the
training-data pipeline (between corpus line dedup and near-dup
removal).  Keeps passing documents with their original schema; the
per-rule verdicts ride along as audit columns so a report job can
break failure rates down without re-running the signals."""

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.curation import gopher_filter


class QualityFilterJob(SparkJob):
    """params (all optional): ``min_words`` / ``max_words`` /
    ``max_top_word_frac`` / ``max_dup_bigram_frac`` /
    ``min_avg_word_len`` / ``max_avg_word_len``; ``keep`` ('passing' =
    filtered corpus, 'verdicts' = every doc with its rule columns)."""

    def transform(self, documents):
        p = self.params
        verdicts = gopher_filter(
            documents,
            min_words=int(p.get("min_words", 50)),
            max_words=int(p.get("max_words", 100_000)),
            max_top_word_frac=float(p.get("max_top_word_frac", 0.2)),
            max_dup_bigram_frac=float(p.get("max_dup_bigram_frac", 0.2)),
            min_avg_word_len=float(p.get("min_avg_word_len", 3.0)),
            max_avg_word_len=float(p.get("max_avg_word_len", 10.0)),
        )
        if p.get("keep", "passing") == "verdicts":
            return verdicts
        keepers = verdicts.where("passes").select("doc_id")
        return documents.join(keepers, "doc_id", "left_semi")
