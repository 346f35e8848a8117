"""Distributed BPE tokenizer induction and application.

Byte-pair-encoding subword training (Sennrich, Haddow & Birch 2016,
arXiv:1508.07909) re-expressed Spark-first — the tokenizer-fitting
step a training-data pipeline runs between curation and tokenization
(no analog in the reference, which stops at generic ETL; SURVEY §2
extension, same family as the DSIR/SemDeDup/ExactSubstr components).

The scale design is the classic word-frequency-table formulation every
production trainer (subword-nmt, SentencePiece, HF tokenizers) uses:

- ONE corpus-scale pass: whitespace words -> (word, freq) via a
  map-side-combining groupBy. 100 TB of text collapses to a
  distinct-word table (Heaps' law: ~10^6-10^7 rows), and every
  training round after that is corpus-size-INDEPENDENT.
- Each merge round runs on the word table only: explode adjacent
  symbol pairs weighted by word freq, partial-agg groupBy(pair),
  take the argmax (a ONE-row driver collect — metadata-scale), and
  rewrite the symbol arrays with an aggregate() fold. Left-to-right
  non-overlap semantics ("aaa" under merge (a,a) -> ["aa","a"]) fall
  out of the fold's lookback naturally.
- Ties break deterministically (count desc, then pair lexicographic)
  so the same corpus yields the IDENTICAL merge sequence on every
  run, partitioning, and engine — the property the pure-python
  reference in the test suite pins.
- Lineage: each round references the prior word table once (a chain,
  like pagerank_fixed_point, not a tree like the CC operators), so
  persist per round + localCheckpoint every ``ckpt_every`` rounds
  bounds both plan growth and recompute.

Honest cost note: R merges = R rounds of word-table aggregation. At
production vocab sizes (30-50k merges) that is hours of scheduler
round-trips even though each round is small; standard practice is to
fit the tokenizer on a SAMPLE of the corpus (deterministic_sample /
bernoulli_sample upstream) — the word-table formulation makes the
per-round cost independent of how big the sampled corpus was.

``bpe_apply`` tokenizes documents with a learned merge list via an
Arrow-batched mapInPandas encoder (the rank-priority merge loop is
per-word imperative work no built-in HOF expresses; the word-level
LRU cache inside each batch exploits Zipf — most tokens are repeats).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yaetos_spark.operators._guards import reserve_helper_cols

END_OF_WORD = "</w>"


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace tokens — the only corpus-scale pass."""
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold(symbols: Column, a: str, b: str) -> Column:
    """Rewrite a symbol array replacing adjacent (a, b) with a+b,
    left-to-right non-overlapping, as a single aggregate() fold."""
    merged = a + b
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) >= 1)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    ckpt_every: int = 10,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a document corpus.

    Returns the ordered merge list [(left, right), ...] — apply with
    ``bpe_apply``. Training stops early when the best remaining pair
    occurs fewer than ``min_pair_count`` times (weighted by word
    frequency), so the returned list can be shorter than requested.

    Words are split into characters with a trailing ``</w>``
    end-of-word symbol (the paper's scheme), so learned units never
    cross word boundaries and word-final units stay distinct from
    word-internal ones.

    Unicode honesty note: the character split (Spark ``split(col,
    '')``) operates on UTF-16 code units, so astral-plane characters
    (emoji, rare CJK) split into surrogate halves that only reunite if
    training merges them — same base-symbol granularity caveat as any
    non-byte-level BPE. Byte-level alphabets (GPT-2 style) sidestep
    this at the cost of the paper's semantics; out of scope here.
    """
    if n_merges < 0:
        raise ValueError(f"bpe_train: n_merges must be >= 0, got {n_merges}")
    spark = docs.sparkSession
    words = (
        _word_counts(docs, text_col)
        .select(
            "freq",
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
            ).alias("syms"),
        )
        .persist()
    )
    merges: list[tuple[str, str]] = []
    prev = words
    for i in range(n_merges):
        pairs = (
            prev.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        # deterministic argmax: count desc, then pair lexicographic —
        # the tie-break is what makes the merge SEQUENCE reproducible
        # across runs/engines (ties are common early in training).
        # One-row collect: metadata-scale by construction.
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        nxt = prev.select("freq", _merge_fold(F.col("syms"), a, b).alias("syms"))
        # chain lineage: persist each round, truncate periodically
        nxt = nxt.localCheckpoint(eager=True) if (i + 1) % ckpt_every == 0 else nxt.persist()
        prev.unpersist()
        prev = nxt
    prev.unpersist()
    words.unpersist()
    return merges


def bpe_vocab(merges: list[tuple[str, str]], alphabet: set[str] | None = None) -> list[str]:
    """The vocabulary a merge list induces: base symbols (optional)
    plus one merged unit per merge, in learning order."""
    vocab = sorted(alphabet) if alphabet else []
    return vocab + [a + b for a, b in merges]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-priority BPE encode of one word (the standard inference
    loop: repeatedly merge the lowest-rank adjacent pair)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list; adds
    ``out_col: array<string>`` (word-boundary-preserving subword
    units, each word ending in its ``</w>``-bearing unit).

    Arrow-batched mapInPandas (intentional vectorized python site —
    the rank-priority merge loop is per-word imperative work). A
    per-batch word->pieces cache exploits Zipf: within a batch, the
    top few thousand word types cover most tokens, so the encoder
    runs once per TYPE, not once per occurrence.
    """
    reserve_helper_cols("bpe_apply", (out_col,), docs)
    ranks = {pair: i for i, pair in enumerate(merges)}
    fields = ", ".join(f"{name} {dtype}" for name, dtype in docs.dtypes)
    out_schema = f"{fields}, {out_col} array<string>"

    def encode_batches(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            col = []
            for text in pdf[text_col]:
                if text is None:
                    col.append([])
                    continue
                pieces: list[str] = []
                for w in str(text).split():
                    hit = cache.get(w)
                    if hit is None:
                        hit = _encode_word(w, ranks)
                        cache[w] = hit
                    pieces.extend(hit)
                col.append(pieces)
            pdf[out_col] = col
            yield pdf

    return docs.mapInPandas(encode_batches, schema=out_schema)
