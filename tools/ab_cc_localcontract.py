"""A/B + identity gate for the r12 per-partition local contraction in
connected_components_star (VERDICT r11 item 2).

Arms (SAME session, interleaved across repeats, probe-noted):
  off = local_contract=False (the exact r11 loop)
  on  = local_contract=True  (committed default)

Outputs are digest-compared per scale (count + decimal node/comp sums
+ order-insensitive xxhash64 sum — the profile_cc_rounds digest) and
round counts are reported from the operator's _round_log.

Run on the scale replicas built by tools/scale_smoke.py:
    python tools/ab_cc_localcontract.py [base] [10x] [100x]
(default: base 10x; pass 100x explicitly — it builds a ~6 GB replica.)
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


def chain_edges(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev", F.lag("event_id").over(w))
        .where(F.col("prev").isNotNull())
        .select(F.col("prev").alias("id1"), F.col("event_id").alias("id2"))
        .localCheckpoint(eager=True)
    )


def run(edges, local_contract):
    log: list = []
    t0 = time.time()
    out = connected_components_star(edges, local_contract=local_contract, _round_log=log)
    dig = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("node").cast("decimal(38,0)")).alias("sn"),
        F.sum(F.col("comp").cast("decimal(38,0)")).alias("sc"),
        F.sum(F.xxhash64("node", "comp").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return round(time.time() - t0, 2), (dig.n, str(dig.sn), str(dig.sc), str(dig.h)), len(log)


def main():
    scales = sys.argv[1:] or ["base", "10x"]
    spark = get_spark()
    results = {}
    for scale in scales:
        edges = chain_edges(spark, DIRS[scale])
        times = {"off": [], "on": []}
        rounds = {}
        digests = {}
        for rep in range(REPEATS):
            for name, lc in (("off", False), ("on", True)):
                sec, dig, n_rounds = run(edges, lc)
                times[name].append(sec)
                rounds[name] = n_rounds
                digests.setdefault(name, dig)
                assert digests[name] == dig, (scale, name, "digest drift across reps")
                print(f"{scale} {name} rep{rep}: {sec}s rounds={n_rounds}", flush=True)
        assert digests["off"] == digests["on"], (scale, digests)
        results[scale] = {
            "off_sec": times["off"],
            "on_sec": times["on"],
            "rounds_off": rounds["off"],
            "rounds_on": rounds["on"],
            "digest_equal": True,
            "digest": digests["on"][0:1],
        }
        edges.unpersist()
        print(f"== {scale}: off {times['off']} on {times['on']} "
              f"rounds {rounds['off']}→{rounds['on']} digest EQUAL", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
