"""Cross-tree heavy-five A/B (r11 continuation session).

Times the bench's HEAVY set in ONE tree per process invocation —
warm-up + median-of-3 per query via materialize_fully, exactly the
bench methodology — so two trees can be compared by ALTERNATING
invocations (both arms share the same host noise window):

    git worktree add /tmp/wt_build <pre-change-sha>
    for rep in 1 2 3; do
        python tools/ab_heavy_cross_tree.py /tmp/wt_build build
        python tools/ab_heavy_cross_tree.py /root/repo head
    done

Used to prove the continuation session's 2-3x heavy-set inflation vs
BENCH_r11.json was host steal, not a code regression (OPTIMIZATION_
r11.md "No-regression cross-tree A/B": the pre-optimization tree
itself measured 22.7-50.5 s against its own committed 7.84 s).

Usage: python tools/ab_heavy_cross_tree.py <repo_dir> <label>
"""

from __future__ import annotations

import gc
import json
import statistics
import sys
import time

repo = sys.argv[1]
label = sys.argv[2]
sys.path.insert(0, repo)

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark.session import get_spark, materialize_fully  # noqa: E402

HEAVY = [
    "rfm_segments",
    "pagerank_trade_graph",
    "near_dup_survivors",
    "ivf_ann_exactprobe",
    "dedup_clusters",
]


def main():
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"heavy_ab_{label}")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs = entrymod.queries()
    out = {}
    for name in HEAVY:
        materialize_fully(qs[name](spark, sf_dir))  # warm
        spark.catalog.clearCache()
        gc.collect()
        runs = []
        for _ in range(3):
            t0 = time.time()
            materialize_fully(qs[name](spark, sf_dir))
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
            gc.collect()
        out[name] = round(statistics.median(runs), 3)
        print(
            f"# {label} {name}: {out[name]} of {[round(r, 3) for r in runs]}",
            file=sys.stderr,
        )
    print(json.dumps({"label": label, "heavy": out, "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
