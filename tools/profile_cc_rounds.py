"""Profile + A/B: where do chain_components' 100x seconds go?

VERDICT r10 item 3: chain_components (star-CC over per-user event
chains) is the worst absolute 100x line (220 s). Two questions:

1. PROFILE — per round, how much is the eager localCheckpoint
   materialization (phases execute inside that call) vs the
   convergence probe? `connected_components_star(_round_log=...)`
   records the split from the REAL operator, no tool-side copy.
2. A/B — checkpoint-every-2-rounds (`_ckpt_every=2`: off-cadence
   rounds persist instead, lineage still bounded at one extra round)
   vs the every-round default. Arms are SAME-SESSION INTERLEAVED
   across repeats; outputs are digest-compared (count + endpoint sums
   + order-insensitive xxhash64 sum — collision-improbable).

Run on the scale replicas built by tools/scale_smoke.py:
    python tools/profile_cc_rounds.py [10x] [100x] [base]
(default: 10x 100x). Paste the JSON line into COVERAGE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from yaetos_spark.operators.graph import connected_components_star  # noqa: E402
from yaetos_spark.session import get_spark  # noqa: E402
from yaetos_spark.sources.tables import load_table  # noqa: E402

DIRS = {
    "base": "/root/testdata/sf0.1",
    "10x": "/tmp/yaetos_spark_scale_smoke_x10",
    "100x": "/tmp/yaetos_spark_scale_smoke_x100",
}
REPEATS = 2
ARMS = [("ckpt1", 1), ("ckpt2", 2)]


def chain_edges(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev", F.lag("event_id").over(w))
        .where(F.col("prev").isNotNull())
        .select(F.col("prev").alias("id1"), F.col("event_id").alias("id2"))
        .localCheckpoint(eager=True)  # edges built once per scale, outside the timed arms
    )


def run(edges, ckpt_every, round_log=None):
    t0 = time.time()
    out = connected_components_star(
        edges, _ckpt_every=ckpt_every, _round_log=round_log
    )
    dig = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("node").cast("decimal(38,0)")).alias("sn"),
        F.sum(F.col("comp").cast("decimal(38,0)")).alias("sc"),
        F.sum(F.xxhash64("node", "comp").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return round(time.time() - t0, 2), (dig.n, str(dig.sn), str(dig.sc), str(dig.h))


def main():
    scales = sys.argv[1:] or ["10x", "100x"]
    spark = get_spark()
    results = {}
    for scale in scales:
        edges = chain_edges(spark, DIRS[scale])
        times = {name: [] for name, _ in ARMS}
        digests = {}
        logs = {}
        for rep in range(REPEATS):
            for name, k in ARMS:
                log = [] if rep == 0 else None  # profile the first rep only
                sec, dig = run(edges, k, log)
                times[name].append(sec)
                digests.setdefault(name, dig)
                if log is not None:
                    logs[name] = log
                assert digests[name] == dig, f"non-deterministic output in {name}"
                print(f"{scale} {name} rep{rep}: {sec}s", file=sys.stderr)
        arms = list(digests.values())
        assert all(d == arms[0] for d in arms), f"arm outputs disagree at {scale}: {digests}"
        edges.unpersist()
        results[scale] = {"sec": times, "rounds": logs}
    print(json.dumps({"profile_cc_rounds": results}))


if __name__ == "__main__":
    main()
