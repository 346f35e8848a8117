"""Detect corpus queries whose plans Catalyst PRUNES under count().

count() references no columns, so the optimizer drops every column
and can eliminate whole join subtrees (a left join against a frame
that is provably unique on the key and contributes nothing
disappears).  Any timing harness that bills count() as "full
execution" silently under-measures exactly those join-topped plans —
r11 found 12 such queries, one of which (dsir_scores) collapsed to a
bare table scan: its 10x smoke line read 0.49 s for a gram-explosion
pipeline.  bench.py and tools/scale_audit.py now time
`session.materialize_fully` (noop sink + Observation) instead; this
probe is the regression check that finds any NEW query whose count()
plan loses Join/Generate nodes, and documents the known-affected set.

Usage: python tools/count_elim_probe.py [sf_dir]
Plan-only — nothing executes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from yaetos_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main(argv: list[str]) -> int:
    sf = argv[0] if argv else "/root/testdata/sf0.001"
    spark = get_spark(app_name="count_elim_probe")
    flagged = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf)
            full = df._jdf.queryExecution().optimizedPlan().toString()
            cnt = df.groupBy().count()._jdf.queryExecution().optimizedPlan().toString()
            fj, cj = full.count("Join"), cnt.count("Join")
            fg, cg = full.count("Generate"), cnt.count("Generate")
            if cj < fj or cg < fg:
                flagged[name] = f"joins {fj}->{cj}, generates {fg}->{cg}"
        except Exception as e:  # noqa: BLE001
            flagged[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        finally:
            spark.catalog.clearCache()
    print(f"flagged: {len(flagged)}")
    for k, v in sorted(flagged.items()):
        print(f"  {k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
