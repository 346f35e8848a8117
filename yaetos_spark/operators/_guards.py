"""Shared input-column guards for operators that write constant
internal helper columns onto USER-provided frames.

``withColumn`` silently OVERWRITES an existing column of the same
name, so an input that happens to carry a column named like an
operator's scratch column would be destroyed (and usually dropped) —
silent data corruption. The fix pattern (ADVICE r9 on
deterministic_sample): refuse loudly. A guard beats renaming the
helpers to exotic names because it adds ZERO plan churn (helper names
stay in committed plan artifacts) and turns the failure mode from
silent to immediate."""

from __future__ import annotations

from pyspark.sql import DataFrame


def reserve_helper_cols(op: str, helpers: tuple[str, ...], *frames: DataFrame) -> None:
    """Raise if any input frame already has a column named like one of
    ``op``'s internal helper columns."""
    for df in frames:
        clash = [c for c in helpers if c in df.columns]
        if clash:
            raise ValueError(
                f"{op}: input columns {clash} collide with internal helper "
                f"names — rename them before calling {op}"
            )
