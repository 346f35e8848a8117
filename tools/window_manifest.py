"""Emit the driver-evaluation window manifest for the current tree.

The grading driver runs the FIRST 50 entries of ``queries()``; which 50
that is depends on ``_rotate_stalest_first`` over the committed
``CORRECTNESS_r*.json`` artifacts plus ``_VERIFY_NEXT``.  This script
materializes that computation WITHOUT creating a SparkSession, so the
per-round ``WINDOW_r{N}.json`` artifact lets a judge audit rotation
coverage (every query's verdict age) without executing the module.

Usage:
    python tools/window_manifest.py            # print to stdout
    python tools/window_manifest.py --out WINDOW_r06.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def build_manifest() -> dict:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    base = entry.queries()  # callables are not invoked — ordering only
    names = list(base)

    # recompute last-pass rounds the same way _rotate_stalest_first does,
    # so the manifest can show verdict ages alongside the order
    import glob
    import re

    last_pass: dict[str, int] = {}
    latest_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest_round = max(latest_round, rnd)
        with open(path) as f:
            data = json.load(f)
        results = data.get("queries", data)
        for name, v in results.items():
            if not isinstance(v, dict):
                continue
            ok = (
                v.get("rows_match") is not False
                and v.get("schema_match") is not False
                and v.get("hash_match") is not False
                and v.get("err") is None
            )
            if ok:
                last_pass[name] = max(last_pass.get(name, 0), rnd)

    next_round = latest_round + 1
    rows = []
    for i, n in enumerate(names):
        lp = last_pass.get(n)
        rows.append(
            {
                "pos": i + 1,
                "name": n,
                "in_window": i < WINDOW,
                "last_pass_round": lp,
                "verdict_age_rounds": (next_round - lp) if lp else None,
                "verify_next": n in entry._VERIFY_NEXT,
            }
        )
    ages = [r["verdict_age_rounds"] for r in rows if r["verdict_age_rounds"]]
    return {
        "for_round": next_round,
        "window_size": WINDOW,
        "total_queries": len(names),
        "max_verdict_age_rounds": max(ages) if ages else None,
        "max_age_outside_window": max(
            (r["verdict_age_rounds"] or 10**9)
            for r in rows
            if not r["in_window"]
        )
        if len(rows) > WINDOW
        else None,
        "verify_next": list(entry._VERIFY_NEXT),
        "queries": rows,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", help="write JSON to this path instead of stdout")
    args = ap.parse_args()
    manifest = build_manifest()
    text = json.dumps(manifest, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(
            f"wrote {args.out}: round {manifest['for_round']}, "
            f"{manifest['total_queries']} queries, "
            f"max verdict age {manifest['max_verdict_age_rounds']}",
            file=sys.stderr,
        )
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
