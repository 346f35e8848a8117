"""Per-query shuffle/input BYTE census via the Spark status REST API.

Wall-clock artifacts (SCALE_AUDIT, the smokes, bench) are hostage to
host noise — this round's hypervisor steal inflates every second by
2-4x.  BYTES are not: steal never changes how much data a plan
shuffles, so per-query shuffle volumes — and their growth ratios
between sf0.1 and the 10x replica — are the noise-immune scale
signal.  A query whose TIME ratio reads 14x under steal but whose
shuffle-byte ratio is 9.8x has a linear plan on a bad host; a query
whose byte ratio is 60x has a super-linear shuffle no quiet host will
save.

Method: run each corpus query to completion through the `noop` sink
(full pipeline execution, no output cost), and diff the cumulative
completed-stage totals from the status REST API (/api/v1/.../stages)
before and after.  Skipped stages (reused exchanges) add nothing, as
in a real run.  Caches are cleared between queries so every byte is
attributable to the query that caused it.

Usage:
    python tools/shuffle_census.py [sf_dir] [name ...]   # subset
    python tools/shuffle_census.py --ratios BASE_JSON BIG_JSON
        # join two census files into growth ratios

Full runs write SHUFFLE_CENSUS.json (base sf dir) at the repo root;
pass --out to redirect (e.g. the 10x replica census).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIELDS = ("shuffleWriteBytes", "shuffleReadBytes", "inputBytes",
          "shuffleWriteRecords", "shuffleReadRecords", "inputRecords")


def stage_totals(ui_url: str, app_id: str) -> dict:
    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    ) as resp:
        stages = json.load(resp)
    out = {f: 0 for f in FIELDS}
    out["n_stages"] = len(stages)
    for s in stages:
        for f in FIELDS:
            out[f] += s.get(f, 0) or 0
    return out


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--ratios":
        base = json.load(open(argv[1]))
        big = json.load(open(argv[2]))
        ratios = {}
        for name, b in base["queries"].items():
            g = big["queries"].get(name)
            if not g or "err" in b or "err" in g:
                continue
            ratios[name] = {
                f: round(g[f] / b[f], 2) if b.get(f) else None
                for f in ("shuffleWriteBytes", "inputBytes")
            }
            ratios[name]["base_shuffle_mb"] = round(b["shuffleWriteBytes"] / 1e6, 2)
            ratios[name]["big_shuffle_mb"] = round(g["shuffleWriteBytes"] / 1e6, 2)
        print(json.dumps({"ratios": ratios}, indent=1, sort_keys=True))
        return 0

    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = (argv[1:] if argv and os.path.isdir(argv[0]) else argv) or None

    from yaetos_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="shuffle_census",
        extra_conf={
            "spark.ui.enabled": "true",
            # cumulative diffs need every completed stage retained
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    if not ui:
        print("status UI unavailable (spark.ui.enabled was overridden?)",
              file=sys.stderr)
        return 1

    qs = entrymod.queries()
    results = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        spark.catalog.clearCache()
        before = stage_totals(ui, app_id)
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 — census must survive one bad query
            results[name] = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        after = stage_totals(ui, app_id)
        rec = {f: after[f] - before[f] for f in FIELDS}
        rec["n_stages"] = after["n_stages"] - before["n_stages"]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        print(f"# {name}: shuffle_write={rec['shuffleWriteBytes']/1e6:.1f}MB "
              f"read={rec['shuffleReadBytes']/1e6:.1f}MB "
              f"input={rec['inputBytes']/1e6:.1f}MB "
              f"stages={rec['n_stages']} ({rec['sec']}s)", file=sys.stderr)

    doc = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "queries": results,
        "totals": {
            f: sum(r.get(f, 0) for r in results.values() if "err" not in r)
            for f in FIELDS
        },
    }
    text = json.dumps(doc, indent=1, sort_keys=True)
    full_run = names is None
    if out_path is None and full_run:
        out_path = os.path.join(REPO, "SHUFFLE_CENSUS.json")
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
        print(f"wrote {out_path}: {len(results)} queries", file=sys.stderr)
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
