"""Interleaved A/B for ivf_ann_exactprobe k-means iteration count
(r11 optimization round; guide §1.2 "don't compute things you throw
away" + same-session interleaving so both arms share the host noise).

The probe-all contract query (`n_probe == n_cells`) returns the exact
brute-force top-k for ANY centroid set — the same argument that
justified `init_mode="random"` (Change 4) also means every Lloyd
iteration beyond the first only improves centroids whose quality the
query provably ignores.  Each extra iteration is a full distributed
pass over the (persisted) features plus its driver round-trip.

OLD arm = max_iter=3 (shipped before this A/B).  NEW arm = max_iter=1.
The tool first asserts the two arms produce the identical result set,
then times `reps` interleaved repetitions of the full entry query via
materialize_fully.

Usage: python tools/ab_ivf_iters.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark.operators import similarity as S  # noqa: E402
from yaetos_spark.session import get_spark, materialize_fully  # noqa: E402


def _query(spark, sf_dir, max_iter):
    """The ivf_ann_exactprobe entry-query body with max_iter as the dial."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < entrymod._ANN_N_QUERIES)
    cents = S.train_ivf_centroids(
        emb, n_cells=4, max_iter=max_iter, init_mode="random"
    )
    return S.ivf_topk(emb, queries, cents, k=entrymod._ANN_K, n_probe=4)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark(app_name="ab_ivf_iters")
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    # identity gate first: byte-equal result sets or no measurement
    rows = {}
    for label, it in (("old", 3), ("new", 1)):
        rows[label] = sorted(
            tuple(r) for r in _query(spark, sf_dir, it).collect()
        )
        spark.catalog.clearCache()
    if rows["old"] != rows["new"]:
        # same-count value mismatches need a row sample, not just
        # counts (ADVICE r11): show a symmetric-difference sample
        old_s, new_s = set(rows["old"]), set(rows["new"])
        only_old = sorted(old_s - new_s)[:5]
        only_new = sorted(new_s - old_s)[:5]
        raise AssertionError(
            f"IDENTITY FAILED: {len(rows['old'])} old vs "
            f"{len(rows['new'])} new rows; only-old sample {only_old}; "
            f"only-new sample {only_new}"
        )
    print(f"identity ok: {len(rows['new'])} rows at {sf_dir}", flush=True)

    for it in (3, 1):  # warm both arms (codegen)
        materialize_fully(_query(spark, sf_dir, it))
        spark.catalog.clearCache()
    old_t, new_t = [], []
    for _ in range(reps):
        for it, sink in ((3, old_t), (1, new_t)):
            t0 = time.time()
            materialize_fully(_query(spark, sf_dir, it))
            sink.append(time.time() - t0)
            spark.catalog.clearCache()
    a, b = statistics.median(old_t), statistics.median(new_t)
    print(f"old (max_iter=3) median {a:.3f}s {[round(t, 3) for t in old_t]}")
    print(f"new (max_iter=1) median {b:.3f}s {[round(t, 3) for t in new_t]}")
    print(f"ratio new/old = {b / a:.3f}")


if __name__ == "__main__":
    main()
