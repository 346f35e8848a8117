"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}.

Methodology: each query runs once untimed (whole-stage codegen
compilation, parquet footer/file-listing caches) then THREE timed
steady-state runs; the reported number is the per-query MEDIAN, so a
single noisy run (sandbox contention) can't push a query over the
baseline line. Steady-state (plan + full execution via count()) is
the figure that scales with data volume; first-run compilation costs
are fixed per query shape and amortize away on real workloads. Cold
totals also included as "cold_total_sec" for transparency.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from yaetos_spark.session import get_spark, materialize_fully

def _spin(_=None) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return time.perf_counter() - t0


def _env_signal() -> dict:
    """Environmental-noise fingerprint recorded into the bench JSON
    (VERDICT r3 item 7: round 2's sandbox contention masqueraded as a
    ~30% regression for a whole round).  ``load_avg_1m`` is the host's
    1-minute run-queue; ``spin_sec`` times a fixed CPU-bound reference
    loop — on an idle host it's a stable constant, so a bench run whose
    spin_sec is inflated is flagged noisy, not regressed.

    ``par_spin_sec`` (ADDED r12, VERDICT r11 item 7 — additions-only):
    the same loop run on every core at once (one process per core);
    this host's hypervisor steal is often UNIFORM across cores, which
    throttles all-core Spark stages while an instantaneous single-core
    probe still reads quiet (r11: single spin 0.638 s "quiet" while the
    parallel mean read 1.03 s/proc and the bench came out 13% high).
    Quiet constant ~0.64 s/proc; the best windows this host offers are
    ~0.89-0.93. Quantifying steal inside the artifact replaces the r11
    best-of-N hunting the verdict disallowed."""
    spin = _spin()
    try:
        import multiprocessing as mp

        n = min(32, os.cpu_count() or 32)
        with mp.Pool(n) as p:
            par = p.map(_spin, range(n))
        par_spin = round(sum(par) / len(par), 3)
    except Exception:
        par_spin = None
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = None
    return {"load_avg_1m": round(load1, 2) if load1 is not None else None,
            "spin_sec": round(spin, 3),
            "par_spin_sec": par_spin}


HEADLINE = [
    "pricing_summary",
    "topk_revenue",
    "region_revenue",
    "user_sessions",
    "running_window",
    "asof_join_events",
    "sessionize_events",
    "wordcount_top",
    "range_band_join",
    "minhash_lsh_pairs",
    "simhash_docs",
    "text_stats",
    "multimodal_decode",
    "ann_cosine_topk",
    "embedding_near_dup",
]

# the scale-audit worst five (VERDICT r4 item 5): tracked with the same
# median-of-3 + spin calibration so regressions in the heavy operators
# show up round-over-round, but totaled SEPARATELY — BASELINE.md's
# 11.5 s line covers exactly the 15 HEADLINE queries, and mixing these
# in would break that comparison. Reference medians recorded in
# BASELINE.md "round-5 heavy extension" table.
HEAVY = [
    "rfm_segments",
    "pagerank_trade_graph",
    "near_dup_survivors",
    "ivf_ann_exactprobe",
    "dedup_clusters",
]

# ADDED r12 (additions-only per the driver contract; "value" and
# "queries" are untouched): the two corpus lines this optimization
# round rebuilt — tracked with the same warm-up + median-of-3
# methodology in their own group so future rounds see them
# round-over-round without distorting the headline/heavy totals the
# BASELINE lines cover.
CORPUS_TRACKED = [
    "lsh_ann_pairs",
    "chain_components",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    env_before = _env_signal()
    spark = get_spark(app_name="yaetos_spark_bench")
    # warm up the JVM + file listing so query timings measure the plans
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    qs = entrymod.queries()
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def time_set(names):
        times, cold = {}, {}
        for name in names:
            t0 = time.time()
            # full-plan materialization, NOT count() (count() lets
            # Catalyst prune join subtrees — see materialize_fully);
            # warm-up: codegen + fs caches
            n = materialize_fully(qs[name](spark, sf_dir))
            cold[name] = round(time.time() - t0, 3)
            runs = []
            for _ in range(n_runs):
                t0 = time.time()
                n = materialize_fully(qs[name](spark, sf_dir))
                runs.append(time.time() - t0)
            times[name] = round(statistics.median(runs), 3)
            print(
                f"# {name}: median {times[name]}s of {[round(r, 3) for r in runs]} "
                f"/ {cold[name]}s cold ({n} rows)",
                file=sys.stderr,
            )
            # same release as tools/scale_audit.py: operators persist()
            # for their own job's lifetime; a sequential bench session
            # keeps the JVM, so minhash's 4 runs would otherwise leave
            # 4 shingle caches pressuring the later heavy queries' GC.
            spark.catalog.clearCache()
            gc.collect()
        return times, cold

    times, cold = time_set(HEADLINE)
    heavy_times, heavy_cold = time_set(HEAVY)
    corpus_times, _corpus_cold = time_set(CORPUS_TRACKED)
    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cold_total_sec": round(sum(cold.values()), 3),
        "heavy_queries": heavy_times,
        "heavy_total_sec": round(sum(heavy_times.values()), 3),
        "heavy_cold_total_sec": round(sum(heavy_cold.values()), 3),
        "corpus_queries": corpus_times,
        "corpus_total_sec": round(sum(corpus_times.values()), 3),
        "env_before": env_before,
        "env_after": _env_signal(),
    }))


if __name__ == "__main__":
    main()
