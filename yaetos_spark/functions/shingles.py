"""Shingle (n-gram) generation — pure Spark SQL higher-order functions.

Word n-grams are built with transform(sequence(...)) + slice, so the
whole pipeline stays in codegen; no Python tokenizer in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str) -> Column:
    """Whitespace tokens of a text column."""
    return F.split(F.trim(F.col(col)), r"\s+")


def word_ngrams(col: str, n: int) -> Column:
    """Distinct word n-gram shingles of a text column as array<string>.

    Documents shorter than n words yield a single shingle of the whole
    text (so they still participate in similarity)."""
    t = f"split(trim({col}), '\\\\s+')"
    expr = (
        f"CASE WHEN size({t}) < {n} THEN array(concat_ws(' ', {t})) "
        f"ELSE array_distinct(transform(sequence(1, size({t}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({t}, i, {n})))) END"
    )
    return F.expr(expr)


def char_ngrams(col: str, n: int) -> Column:
    """Distinct character n-gram shingles as array<string>."""
    expr = (
        f"CASE WHEN length({col}) < {n} THEN array({col}) "
        f"ELSE array_distinct(transform(sequence(1, length({col}) - {n} + 1), "
        f"i -> substring({col}, i, {n}))) END"
    )
    return F.expr(expr)
