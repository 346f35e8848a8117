"""Interleaved A/B of runtime-settable SQL confs over bench queries.

Usage: python tools/ab_conf.py '<conf json>' [query ...] [--reps N]
Example:
  python tools/ab_conf.py '{"spark.sql.adaptive.coalescePartitions.minPartitionSize":"64k"}' minhash_lsh_pairs
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark.session import get_spark, materialize_fully  # noqa: E402

DEFAULT_QUERIES = [
    "pricing_summary",
    "simhash_docs",
    "minhash_lsh_pairs",
    "wordcount_top",
    "running_window",
    "rfm_segments",
    "dedup_clusters",
    "near_dup_survivors",
    "pagerank_trade_graph",
    "ivf_ann_exactprobe",
]


def main():
    conf = json.loads(sys.argv[1])
    args = sys.argv[2:]
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    names = args or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_conf")
    base_vals = {k: spark.conf.get(k, None) for k in conf}
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs = entrymod.queries()

    def set_arm(on: bool):
        for k, v in (conf if on else base_vals).items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    for name in names:
        a_times, b_times = [], []
        for arm in (False, True):
            set_arm(arm)
            materialize_fully(qs[name](spark, sf_dir))
            spark.catalog.clearCache()
        for _ in range(reps):
            for arm, sink in ((False, a_times), (True, b_times)):
                set_arm(arm)
                t0 = time.time()
                materialize_fully(qs[name](spark, sf_dir))
                sink.append(time.time() - t0)
                spark.catalog.clearCache()
        a, b = statistics.median(a_times), statistics.median(b_times)
        print(
            f"{name}: base {round(a,3)}s {[round(x,2) for x in a_times]} | "
            f"conf {round(b,3)}s {[round(x,2) for x in b_times]} | ratio {round(b/a,2)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
