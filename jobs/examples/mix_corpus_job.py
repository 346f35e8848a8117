"""Data-mixture job: select (and optionally repeat) documents so the
output matches a target group mixture at a fixed budget — the
domain/language reweighting step of an LLM training pipeline (DoReMi,
arXiv:2305.10429; the sampling-proportion tables of the LLaMA/Pile
reports). Selection is md5-hash deterministic: a rerun, or another
engine, picks the identical subset.

``targets`` is a mapping of group value -> target weight (normalized
over the listed groups; unlisted groups are dropped). ``budget`` is in
rows, or in ``weight_col`` units when set (e.g. a token budget over a
token-count column). ``max_epochs`` > 1 allows upsampling: a group
needing 2.3 epochs emits every doc at _epoch 0 and 1 plus a
deterministic ~30% subset at _epoch 2.
See yaetos_spark/operators/curation.py:mix_to_target.
"""

from yaetos_spark.job import SparkJob
from yaetos_spark.operators.curation import mix_to_target


class MixCorpusJob(SparkJob):
    """params: ``group_col``, ``targets`` (dict), ``budget`` (int),
    ``weight_col`` (None = row budget), ``max_epochs``,
    ``on_infeasible`` ('redistribute' water-fills surplus from
    capacity-clipped groups; 'error' is strict; 'clip' accepts the
    shortfall), ``exact`` (exact per-group row counts, or — with
    ``weight_col`` — exact token budgets via greedy hash-prefix
    selection; default False = binomial rate mode)."""

    def transform(self, documents):
        targets = self.params.get("targets") or {}
        if not targets:
            raise ValueError(
                "mix_corpus job needs a non-empty `targets` mapping "
                "(group value -> target weight) in its registry params"
            )
        weight_col = self.params.get("weight_col")
        return mix_to_target(
            documents,
            group_col=self.params.get("group_col", "lang"),
            targets={k: float(v) for k, v in targets.items()},
            budget=int(self.params.get("budget", 1000)),
            weight_col=weight_col,
            max_epochs=float(self.params.get("max_epochs", 1.0)),
            on_infeasible=self.params.get("on_infeasible", "redistribute"),
            exact=bool(self.params.get("exact", False)),
        )
