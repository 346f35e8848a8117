"""A/B: winnowing fingerprint hash — oracle-exact md5 vs production
xxhash64 (VERDICT r9 item 5).

Runs winnow_fingerprints + winnow_overlap_pairs on the documents table
of the 10x and 100x scale-smoke replicas (built by tools/scale_smoke.py
under /tmp) with hash_fn='md5' and hash_fn='xxhash64', interleaved so
host contention lands on both arms equally.  The md5 contract query is
untouched — this measures what the xxhash64 option buys the 100 TB
path where cross-engine bit-parity is not needed.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from yaetos_spark.operators.text import winnow_fingerprints, winnow_overlap_pairs  # noqa: E402
from yaetos_spark.session import get_spark  # noqa: E402

REPLICAS = {
    "10x": "/tmp/yaetos_spark_scale_smoke_x10",
    "100x": "/tmp/yaetos_spark_scale_smoke_x100",
}
REPEATS = 2


def run(spark, path, hash_fn):
    docs = spark.read.parquet(f"{path}/documents.parquet")
    t0 = time.time()
    fps = winnow_fingerprints(docs, k=8, window=4, hash_fn=hash_fn)
    n_pairs = winnow_overlap_pairs(fps, min_shared=2, max_doc_freq=50).count()
    sec = round(time.time() - t0, 2)
    fps.unpersist()  # winnow_overlap_pairs persists its input
    return sec, n_pairs


def main():
    spark = get_spark()
    results = {}
    for scale, path in REPLICAS.items():
        times = {"md5": [], "xxhash64": []}
        pairs = {}
        for rep in range(REPEATS):
            for hf in ("md5", "xxhash64"):
                sec, n = run(spark, path, hf)
                times[hf].append(sec)
                pairs[hf] = n
                print(f"{scale} {hf} rep{rep}: {sec}s pairs={n}", file=sys.stderr)
        results[scale] = {"sec": times, "pairs": pairs}
    print(json.dumps({"ab_winnow_hash": results}))


if __name__ == "__main__":
    main()
