"""End-to-end training-data curation pipeline over a documents table:
quality gate (repetition + contamination filters) → PII redaction →
deterministic sampling → sequence packing manifest.

The curation analog of dedup_pipeline_job: the steps a pretraining
corpus runs between raw ingest and tokenization, wired through the
same SparkJob contract so it registers in conf/jobs.yml and chains in
a Flow like any other job.
"""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.curation import (
    bernoulli_sample,
    ngram_contamination,
    pack_sequences,
    redact_pii,
    repetition_profile,
)


class CurationPipelineJob(SparkJob):
    """params: ``max_top_word_frac`` (repetition gate),
    ``max_contamination`` (eval-overlap gate — docs at/above are
    dropped), ``sample_p`` (deterministic keep rate),
    ``budget_tokens`` (packing window), ``emit`` ('documents' =
    cleaned corpus, 'manifest' = packed-window manifest)."""

    def transform(self, documents, eval_set):
        max_rep = float(self.params.get("max_top_word_frac", 0.5))
        max_cont = float(self.params.get("max_contamination", 0.5))
        sample_p = float(self.params.get("sample_p", 1.0))
        budget = int(self.params.get("budget_tokens", 2048))
        # eval_mod: carve a held-out eval slice out of a single corpus
        # (doc_id % mod == 0) when no separate benchmark table exists
        eval_mod = self.params.get("eval_mod")
        if eval_mod:
            m = int(eval_mod)
            eval_set = eval_set.where(F.col("doc_id") % m == 0)
            documents = documents.where(F.col("doc_id") % m != 0)

        rep = repetition_profile(documents).where(F.col("top_word_frac") <= max_rep)
        kept = documents.join(rep.select("doc_id"), "doc_id", "left_semi")

        contaminated = (
            ngram_contamination(kept, eval_set, n=2)
            .where(F.col("contamination_ratio") >= max_cont)
            .select("doc_id")
        )
        kept = kept.join(contaminated, "doc_id", "left_anti")

        clean = redact_pii(kept).join(
            kept.drop("text"), "doc_id"
        ).withColumnRenamed("redacted", "text")

        sampled = bernoulli_sample(clean, sample_p).drop("u")
        if self.params.get("emit", "documents") == "manifest":
            return pack_sequences(sampled, budget_tokens=budget)
        return sampled
