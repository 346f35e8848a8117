"""BPE tokenizer induction tests — the distributed trainer vs an
independent pure-python Sennrich-style reference (merge sequence AND
resulting segmentations), plus encoder/contract checks."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from yaetos_spark.operators.tokenizer import (
    END_OF_WORD,
    bpe_apply,
    bpe_train,
    bpe_vocab,
)

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _ref_train(word_freqs, n_merges, min_pair_count=2):
    """Independent reference: dict-based Sennrich trainer with the same
    deterministic tie-break (count desc, then pair lexicographic)."""
    words = [(list(w) + [END_OF_WORD], f) for w, f in word_freqs.items()]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_pair_count:
            break
        merges.append((a, b))
        nxt = []
        for syms, f in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, f))
        words = nxt
    return merges, words


def _ref_encode(word, merges):
    """Sequential merge replay (subword-nmt inference style)."""
    syms = list(word) + [END_OF_WORD]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_train_paper_example(spark):
    """The arXiv:1508.07909 shape: 'est' units emerge from the
    newest/widest family, 'low' from the low/lower family."""
    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))],
        "doc_id bigint, text string",
    )
    merges = bpe_train(docs, 5)
    assert merges == [("e", "s"), ("es", "t"), ("est", END_OF_WORD), ("l", "o"), ("lo", "w")]
    assert bpe_vocab(merges) == ["es", "est", "est</w>", "lo", "low"]


@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5),
        min_size=1,
        max_size=12,
    ),
    st.integers(0, 6),
)
@settings(**SETTINGS)
def test_bpe_train_matches_reference(spark, words, n_merges):
    """Distributed trainer == pure-python reference on random corpora:
    identical merge SEQUENCE, and the rank-priority Spark encoder
    reproduces the reference's sequential-replay segmentations."""
    freqs = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id bigint, text string"
    )
    got = bpe_train(docs, n_merges)
    want, _ = _ref_train(freqs, n_merges)
    assert got == want
    if got:
        out = {r.doc_id: r.bpe_tokens for r in bpe_apply(docs, got).collect()}
        for i, w in enumerate(words):
            assert out[i] == _ref_encode(w, got), (w, got)


def test_bpe_train_min_pair_count_stops_early(spark):
    """All-unique pairs below min_pair_count: training stops at zero
    merges rather than memorizing hapax pairs."""
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id bigint, text string")
    assert bpe_train(docs, 10, min_pair_count=2) == []


def test_bpe_apply_contracts(spark):
    """NULL text encodes to []; output column collision refuses loudly;
    word boundaries survive (each word contributes a </w>-terminated
    unit run)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "aa ab"), (2, None)], "doc_id bigint, text string"
    )
    merges = [("a", "a"), ("aa", END_OF_WORD)]
    rows = {r.doc_id: r.bpe_tokens for r in bpe_apply(docs, merges).collect()}
    assert rows[1] == ["aa</w>", "a", "b", END_OF_WORD]
    assert rows[2] == []
    with pytest.raises(ValueError, match="bpe_tokens"):
        bpe_apply(docs.withColumn("bpe_tokens", F.lit("x")), merges)
