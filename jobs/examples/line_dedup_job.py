"""Corpus-level line dedup as a registry job — stage 1 of the
training-data pipeline (boilerplate lines out before doc-level dedup
sees the text).  Wraps operators/curation.py::dedup_corpus_lines; the
output keeps the documents schema so downstream jobs chain on it
unchanged (reference job-chaining shape: jobs/examples/
ex4_dependency*_job.py)."""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.curation import dedup_corpus_lines


class LineDedupJob(SparkJob):
    """params: ``min_docs`` (lines in >= this many distinct docs are
    dropped), ``delimiter`` (line split regex, default newline)."""

    def transform(self, documents):
        min_docs = int(self.params.get("min_docs", 3))
        delim = self.params.get("delimiter", "\n")
        cleaned = dedup_corpus_lines(
            documents, text_col="text", id_col="doc_id",
            min_docs=min_docs, delimiter=delim,
        )
        keep_cols = [c for c in documents.columns if c not in ("text", "n_chars")]
        return (
            documents.select(*keep_cols)
            .join(cleaned, "doc_id")
            .select(
                *keep_cols,
                F.col("text_clean").alias("text"),
                F.length("text_clean").alias("n_chars"),
                "n_removed",
            )
        )
