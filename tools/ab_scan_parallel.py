"""Interleaved A/B: does repartitioning a single-row-group scan help?

Times selected queries as-is vs with the table loader forced to
repartition after the read (SPARK_GRAFT_SCAN_REPART env toggles the
loader behavior once implemented; before that, this script monkeypatches
load_table). Interleaved A/B in ONE session so host noise hits both arms.

Usage: python tools/ab_scan_parallel.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark import session as sess  # noqa: E402
from yaetos_spark.session import get_spark, materialize_fully  # noqa: E402
from yaetos_spark.sources import tables as T  # noqa: E402

# only the big/CPU-dense tables: small dimension tables usually feed
# broadcast sides where an extra exchange is pure cost
BIG_TABLES = {"lineitem", "orders", "events", "documents", "embeddings"}

QUERIES = [
    "pricing_summary",
    "simhash_docs",
    "text_stats",
    "ann_cosine_topk",
    "embedding_near_dup",
    "wordcount_top",
    "running_window",
    "user_sessions",
    "minhash_lsh_pairs",
    "topk_revenue",
]

_mode = {"on": False}


def patched_load(spark, sf_dir, name):
    return T.load_table(
        spark, sf_dir, name, parallelize=_mode["on"] and name in BIG_TABLES
    )


def main():
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    names = []
    for a in sys.argv[1:]:
        if a.startswith("/"):
            sf_dir = a
        elif a.isdigit():
            reps = int(a)
        else:
            names.append(a)
    global QUERIES
    if names:
        QUERIES = names
    # both arms run through patched_load: ON parallelizes every big
    # table; OFF disables parallelization even for _tp call sites, so
    # the A/B stays valid after winners were flipped in the entry module
    entrymod._t = lambda spark, sf, name: patched_load(spark, sf, name)
    entrymod._tp = entrymod._t
    spark = get_spark(app_name="ab_scan_parallel")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs = entrymod.queries()
    results = {}
    for name in QUERIES:
        a_times, b_times = [], []
        # warm both arms once
        for arm in (False, True):
            _mode["on"] = arm
            materialize_fully(qs[name](spark, sf_dir))
            spark.catalog.clearCache()
        for _ in range(reps):
            for arm, sink in ((False, a_times), (True, b_times)):
                _mode["on"] = arm
                t0 = time.time()
                materialize_fully(qs[name](spark, sf_dir))
                sink.append(time.time() - t0)
                spark.catalog.clearCache()
        import statistics

        a, b = statistics.median(a_times), statistics.median(b_times)
        results[name] = (round(a, 3), round(b, 3))
        print(
            f"{name}: base {round(a,3)}s {[round(x,2) for x in a_times]} | "
            f"repart {round(b,3)}s {[round(x,2) for x in b_times]} | "
            f"ratio {round(b/a,2)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
