"""Re-validate committed starved-scan repartition flips (guide §1.2).

Interleaved A/B inside ONE session: the OFF arm sets
``SPARK_GRAFT_SCAN_PARALLELIZE=0`` (the loader gate reads the env at
call time, so this restores the exact pre-change plan, including the
keyed ``parallelize="col"`` call sites); the ON arm runs the committed
code unmodified.  Both arms therefore hit the same host noise, and the
ON arm measures exactly what ships — unlike ab_scan_parallel.py, whose
ON arm forces the table's natural key and so cannot reproduce keyed
flips like running_window(l_suppkey).

Usage: python tools/ab_validate_flips.py [sf_dir] [reps] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark.session import get_spark, materialize_fully  # noqa: E402

# the committed flips whose first-batch ratios were in the noise band
# (>0.70) and so need a second, independent confirmation
DEFAULT_QUERIES = [
    "trailing_range_window",
    "lead_order_gaps",
    "rfm_segments",
    "pii_redaction",
    "ngram_contamination",
    "part_pairs_support",
    "revenue_share",
    "lsh_ann_pairs",
    "minhash_lsh_pairs",
    "simhash_docs",
    "ngram_jaccard_pairs",
    "topk_revenue",
    "user_sessions",
    "event_gaps",
    "window_frames_ex2",
    "resample_locf",
    "dedup_clusters",
]


def main():
    sf_dir = "/root/testdata/sf0.1"
    reps = 7
    names = []
    for a in sys.argv[1:]:
        if a.startswith("/"):
            sf_dir = a
        elif a.isdigit():
            reps = int(a)
        else:
            names.append(a)
    queries = names or DEFAULT_QUERIES
    spark = get_spark(app_name="ab_validate_flips")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs = entrymod.queries()
    for name in queries:
        off_times, on_times = [], []
        for arm in ("0", "1"):  # warm both arms once
            os.environ["SPARK_GRAFT_SCAN_PARALLELIZE"] = arm
            materialize_fully(qs[name](spark, sf_dir))
            spark.catalog.clearCache()
        for _ in range(reps):
            for arm, sink in (("0", off_times), ("1", on_times)):
                os.environ["SPARK_GRAFT_SCAN_PARALLELIZE"] = arm
                t0 = time.time()
                materialize_fully(qs[name](spark, sf_dir))
                sink.append(time.time() - t0)
                spark.catalog.clearCache()
        os.environ.pop("SPARK_GRAFT_SCAN_PARALLELIZE", None)
        a, b = statistics.median(off_times), statistics.median(on_times)
        print(
            f"{name}: off {round(a,3)}s {[round(x,2) for x in off_times]} | "
            f"on {round(b,3)}s {[round(x,2) for x in on_times]} | "
            f"ratio {round(b/a,2)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
