"""Scale audit — run EVERY ``queries()`` entry at a scale factor and
record per-query wall time + row count as a committed artifact.

This scripts the COVERAGE.md claim ("all 112 queries execute at sf0.1
with zero errors") so it is reproducible instead of prose: the output
JSON (``SCALE_AUDIT.json`` at the repo root) carries the sf dir, the
environment fingerprint, and one ``{rows, sec, err}`` record per query.

Usage:
    python tools/scale_audit.py [sf_dir] [query ...] [--out PATH]

Defaults: sf_dir=$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, all
queries, out=SCALE_AUDIT.json next to the repo root (only when running
the full set — a subset run prints to stdout instead so partial runs
can't overwrite the full artifact).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark.session import get_spark, materialize_fully  # noqa: E402


def _env_signal() -> dict:
    """Same environmental-noise fingerprint bench.py records (VERDICT
    r4 item 1): 1-minute load average plus a fixed CPU-bound spin loop.
    On a quiet host spin_sec is a stable constant (~0.64 here); an
    inflated value marks the audit as contended, so its timings are
    read as noisy rather than as plan regressions."""
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    spin = time.perf_counter() - t0
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = None
    return {"load_avg_1m": round(load1, 2) if load1 is not None else None,
            "spin_sec": round(spin, 3)}


def run_audit(spark, sf_dir: str, names=None, warmup: bool = True) -> dict:
    qs = entrymod.queries()
    names = list(names) if names else list(qs)
    results = {}
    # Untimed warm-up: the stalest-first ordering made whichever query
    # ran FIRST absorb the fresh session's JIT/codegen/first-parquet
    # cost (r9: it inflated incremental_dedup_survivors to 19.2 s vs
    # its 5.6-6.9 s warm cost), so the artifact's "worst" column ranked
    # positions, not plans.  Run the first query once, untimed, then
    # time everything — position 1 is now as warm as position 100.
    if warmup and names:
        try:
            materialize_fully(qs[names[0]](spark, sf_dir))
        except Exception:
            pass  # the timed run below reports the error
        spark.catalog.clearCache()
        gc.collect()
    for name in names:
        t0 = time.time()
        try:
            # full-plan materialization, NOT count(): Catalyst prunes
            # join subtrees under count() (see session.materialize_fully
            # — r11 found 12 corpus queries under-measured that way)
            n = materialize_fully(qs[name](spark, sf_dir))
            results[name] = {"rows": n, "sec": round(time.time() - t0, 2), "err": None}
        except Exception as e:  # keep auditing the rest; the artifact shows what broke
            results[name] = {
                "rows": None,
                "sec": round(time.time() - t0, 2),
                "err": f"{type(e).__name__}: {str(e)[:200]}",
            }
        # release this query's persisted intermediates before the next
        # one runs. Operators persist() for their own job's lifetime
        # (the framework runs one application per job, so the cache
        # dies with it); a sequential audit session keeps the JVM, and
        # at 100x a single leaked shingle cache (~GBs) starves the next
        # query's broadcast build ("Not enough memory to build and
        # broadcast") even though both queries pass in isolation.
        spark.catalog.clearCache()
        gc.collect()  # drop py refs so ContextCleaner reclaims localCheckpoints
        print(f"# {name}: {results[name]}", file=sys.stderr)
    return results


def main(argv: list[str]) -> int:
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = argv[1:] or None

    env_before = _env_signal()
    spark = get_spark(app_name="scale_audit")
    t0 = time.time()
    results = run_audit(spark, sf_dir, names)
    errs = {k: v["err"] for k, v in results.items() if v["err"]}
    doc = {
        "env_before": env_before,
        "env_after": _env_signal(),
        "warmup_query": (names or list(entrymod.queries()))[0],
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_errors": len(errs),
        "total_sec": round(time.time() - t0, 1),
        "worst": sorted(
            ((v["sec"], k) for k, v in results.items()), reverse=True
        )[:5],
        "queries": results,
    }
    full_run = names is None
    if full_run:
        out_path = out_path or os.path.join(REPO, "SCALE_AUDIT.json")
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"wrote {out_path}: {doc['n_queries']} queries, "
              f"{doc['n_errors']} errors, {doc['total_sec']}s total")
    else:
        print(json.dumps(doc, indent=1, sort_keys=True))
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
