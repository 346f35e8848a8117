"""A/B: star-CC phase modes on an adversarial power-law graph.

VERDICT r9 item 2 / ADVICE r9 medium: the default star-CC phases used
``Window.partitionBy(u)``, which funnels a hub's whole neighborhood
into ONE unsplittable task.  This measures, at 10x-replica scale, the
three modes on a graph built to trigger exactly that:

- a power-law graph: one hub with HUB_DEG leaves, a second-tier of
  sqrt-degree hubs chained to it, plus background 2-node edges — the
  shape of web-link / social graphs; and
- a long-chain graph (the bounded-degree shape the window plan wins
  on), as the control arm.

Modes: window (skew_robust=False), robust (True), auto (None — the
r10 default: per-round degree probe, one-way switch), and auto_fired
(None with skew_switch_degree=500k — ADVICE r10: HUB_DEG here is 2M,
below the 5M production threshold, so plain 'auto' measures the probe
overhead on the window plan; this arm forces the switch to actually
fire so the committed tool reproduces the forced-switch numbers
COVERAGE.md cites, without a manual override).

Arms are INTERLEAVED across repeats so host contention lands on every
mode equally; each line reports per-repeat times.  Output appends
nothing — paste the JSON line into COVERAGE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from yaetos_spark.operators.graph import connected_components_star  # noqa: E402
from yaetos_spark.session import get_spark  # noqa: E402

HUB_DEG = 2_000_000
N_SECOND = 1_000
N_BACKGROUND = 2_000_000
CHAIN_LEN = 2_000_000
REPEATS = 2


def powerlaw(spark):
    # hub 0 with HUB_DEG leaves
    hub = spark.range(1, HUB_DEG + 1).select(
        F.lit(0).cast("long").alias("id1"), F.col("id").alias("id2")
    )
    # second-tier hubs (ids 10^9 + k) each with 1000 leaves, chained to hub 0
    second = (
        spark.range(N_SECOND * 1_000)
        .select(
            (F.lit(10**9) + (F.col("id") / 1_000).cast("long")).alias("id1"),
            (F.lit(2 * 10**9) + F.col("id")).alias("id2"),
        )
    )
    bridges = spark.range(N_SECOND).select(
        F.lit(0).cast("long").alias("id1"), (F.lit(10**9) + F.col("id")).alias("id2")
    )
    # background disjoint 2-cliques
    bg = spark.range(N_BACKGROUND).select(
        (F.lit(4 * 10**9) + F.col("id") * 2).alias("id1"),
        (F.lit(4 * 10**9) + F.col("id") * 2 + 1).alias("id2"),
    )
    return hub.unionByName(second).unionByName(bridges).unionByName(bg)


def chain(spark):
    # 200 disjoint chains of CHAIN_LEN/200 nodes each (the honest
    # bounded-degree control: multiple components, no giant hub)
    n = CHAIN_LEN
    return (
        spark.range(n)
        .select(
            F.col("id").alias("id1"),
            (F.col("id") + 1).alias("id2"),
            (F.col("id") % (n // 200)).alias("_m"),
        )
        .where(F.col("_m") != (n // 200) - 1)
        .drop("_m")
    )


def run(graph_df, mode, switch_degree=5_000_000):
    t0 = time.time()
    out = connected_components_star(
        graph_df, skew_robust=mode, skew_switch_degree=switch_degree
    )
    n = out.count()
    return round(time.time() - t0, 2), n


ARMS = [
    ("window", False, 5_000_000),
    ("robust", True, 5_000_000),
    ("auto", None, 5_000_000),
    # forced-fire arm: threshold below HUB_DEG so the probe trips and
    # the run pays probe + switched robust phases (see module docstring)
    ("auto_fired", None, 500_000),
]


def main():
    spark = get_spark()
    results = {}
    for gname, builder in [("powerlaw", powerlaw), ("chain", chain)]:
        g = builder(spark).localCheckpoint(eager=True)
        times = {m: [] for m, _mode, _sw in ARMS}
        counts = set()
        for rep in range(REPEATS):
            for mname, mode, switch_degree in ARMS:
                sec, n = run(g, mode, switch_degree)
                times[mname].append(sec)
                counts.add(n)
                print(f"{gname} {mname} rep{rep}: {sec}s n={n}", file=sys.stderr)
        assert len(counts) == 1, f"mode outputs disagree on {gname}: {counts}"
        results[gname] = {m: times[m] for m in times}
        g.unpersist()
    print(json.dumps({"ab_cc_skew": results, "edges": {"powerlaw": HUB_DEG + N_SECOND * 1_000 + N_SECOND + N_BACKGROUND, "chain": CHAIN_LEN}}))


if __name__ == "__main__":
    main()
