"""Driver-conditions A/B for committed scan-repartition flips (r12,
VERDICT r11 item 1).

The r11 in-session interleaved A/Bs said three flips won, but the
driver's cold run said they regressed (pricing_summary 0.48x).  The
difference is the measurement environment: the driver runs bench.py in
a FRESH process (cold JVM/JIT), on a vanilla bench session, and also at
8 cores.  This tool reproduces exactly that:

- one subprocess per rep (cold JVM every time, bench.py's session +
  lineitem warm-up + per-query warm-up run + median of 3 timed
  ``materialize_fully`` runs — byte-for-byte the bench methodology);
- arms alternated OFF/ON (OFF = SPARK_GRAFT_SCAN_PARALLELIZE=0, which
  restores the exact pre-flip plan including keyed call sites);
- each rep gated on the 32-way PARALLEL spin probe (this host's steal
  is often uniform across cores and invisible to a single-thread
  probe — see tools/bench_hunt.py);
- run at both SPARK_GRAFT_CPUS=32 and 8.

Usage:
  python tools/ab_driver_cond.py [--reps N] [--gate S] [--cpus 32,8] [query ...]
  python tools/ab_driver_cond.py --child <query> <sf_dir>   (internal)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = ["pricing_summary", "text_stats", "embedding_near_dup"]


def _spin(_):
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return time.perf_counter() - t0


def parallel_probe(nproc: int | None = None) -> float:
    n = nproc or min(32, os.cpu_count() or 32)
    with mp.Pool(n) as p:
        r = p.map(_spin, range(n))
    return round(sum(r) / len(r), 3)


def child(query: str, sf_dir: str) -> None:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod
    from yaetos_spark.session import get_spark, materialize_fully

    spark = get_spark(app_name="yaetos_spark_bench")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    qs = entrymod.queries()
    t0 = time.time()
    materialize_fully(qs[query](spark, sf_dir))
    cold = time.time() - t0
    runs = []
    for _ in range(3):
        t0 = time.time()
        materialize_fully(qs[query](spark, sf_dir))
        runs.append(time.time() - t0)
    print(json.dumps({
        "median": round(statistics.median(runs), 3),
        "runs": [round(r, 3) for r in runs],
        "cold": round(cold, 3),
    }))


def run_rep(query: str, sf_dir: str, cpus: int, arm_on: bool) -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SCAN_PARALLELIZE="1" if arm_on else "0")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", query, sf_dir],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        print(f"  !! child failed rc={out.returncode}: {(out.stderr or '')[-300:]}",
              flush=True)
        return None
    return json.loads(lines[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
        return
    reps, gate = 3, 1.05
    cpus_list = [32, 8]
    names = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--gate":
            gate = float(args[i + 1]); i += 2
        elif a == "--cpus":
            cpus_list = [int(x) for x in args[i + 1].split(",")]; i += 2
        else:
            names.append(a); i += 1
    queries = names or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results: dict[str, dict] = {}
    for cpus in cpus_list:
        for q in queries:
            off_m, on_m = [], []
            for r in range(reps):
                for arm_on, sink in ((False, off_m), (True, on_m)):
                    while True:
                        pm = parallel_probe()
                        if pm <= gate:
                            break
                        print(f"  .. probe {pm} > gate {gate}, waiting", flush=True)
                        time.sleep(60)
                    res = run_rep(q, sf_dir, cpus, arm_on)
                    if res is not None:
                        sink.append(res["median"])
                        print(f"  {q}@{cpus} rep{r} {'on ' if arm_on else 'off'} "
                              f"median {res['median']} runs {res['runs']} "
                              f"cold {res['cold']} (probe {pm})", flush=True)
            if off_m and on_m:
                o, n = statistics.median(off_m), statistics.median(on_m)
                key = f"{q}@{cpus}"
                results[key] = {"off": off_m, "on": on_m,
                                "ratio": round(n / o, 3)}
                print(f"== {key}: off {round(o,3)}s {off_m} | on {round(n,3)}s "
                      f"{on_m} | ratio on/off {round(n/o, 3)}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
