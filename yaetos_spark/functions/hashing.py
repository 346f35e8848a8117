"""Deterministic, engine-portable hashing helpers.

Everything here is built on md5 of explicit strings so that a DuckDB
oracle can reproduce the exact values — Spark's ``hash()``/``xxhash64``
use engine-specific seeds, so they can't be oracle-checked. md5 is
computed JVM-side (codegen'd) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_fingerprint(col: Column | str) -> Column:
    """md5 hex fingerprint of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def md5_long(col: Column, bits: int = 32) -> Column:
    """First ``bits`` bits of md5 as a non-negative long.

    conv(hex, 16, 10) parses the leading hex chars; 32 bits = 8 hex
    chars keeps everything in long range portably.
    """
    n_hex = bits // 4
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


def seeded_md5(col: Column, seed: int) -> Column:
    """Seed-parameterized md5 — the family of 'permutations' used by
    MinHash. min(seeded_md5(shingle, i)) over a doc's shingles is a
    valid minhash because md5 is uniform and the lexicographic min of
    hex strings is a total order."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))


def normalize_text(col: Column | str) -> Column:
    """Canonical text form for fingerprinting: lowercase, strip
    non-alphanumerics to spaces, collapse whitespace, trim.

    ONE run-matching regex pass, not the textbook strip-then-collapse
    pair: any maximal run of non-alphanumerics (punctuation and
    whitespace alike) becomes one space, which is exactly what
    char-strip + whitespace-collapse compose to — property-tested
    equivalent — while replacing per-CHARACTER match events with
    per-RUN ones. Measured on the 100x replica corpus: 32-35 s for the
    two-pass chain vs 0.9-1.5 s fused (the single-char patterns made
    regexp_replace allocate per character)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))
