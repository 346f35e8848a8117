"""Higher-order-function helpers for safe expression reuse."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body) -> Column:
    """Single-evaluation let-binding for expensive sub-expressions.

    ``transform()`` evaluates its input array exactly once and binds
    each element to the lambda variable, so wrapping ``value`` in a
    one-element array gives ``body`` a reference Catalyst cannot
    inline. Without this, CollapseProject merges chained projections
    and re-evaluates the producing expression at EVERY use site —
    referencing a regex-normalized string inside a transform() over
    its ~N character positions turns O(N) work into O(N^2), and a
    second HOF layer into O(N^3) (measured: 9s -> 45min at sf0.001
    for the winnowing fingerprinter before this helper).

    Usage::

        let(expensive_expr, lambda v: f(v, g(v), h(v)))
    """
    return F.element_at(F.transform(F.array(value), body), 1)
