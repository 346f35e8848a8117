"""Quiet-host window poller (VERDICT r10 item 4).

Appends one JSON line per probe to HOSTLOG_r{N}.txt: timestamp,
1-minute load average, and spin_sec (the same fixed 20M-iteration
CPU-bound reference loop bench.py fingerprints with — quiet-host
constant ~0.64 s on this box).  Benches committed under hypervisor
steal are honest only if the steal is DOCUMENTED; this log is that
documentation, and doubles as the trigger: when a probe reads
spin < the --quiet threshold, run bench.py immediately.

Usage:
    python tools/quiet_poll.py --out HOSTLOG_r11.txt --interval 120 \
        [--once] [--quiet 0.9]

Exit code with --once: 0 if the probe was quiet, 1 otherwise — so a
shell loop can gate a bench run on it.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def probe() -> dict:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    spin = time.perf_counter() - t0
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = None
    return {
        "ts": int(time.time()),
        "load_avg_1m": round(load1, 2) if load1 is not None else None,
        "spin_sec": round(spin, 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="HOSTLOG_r11.txt")
    ap.add_argument("--interval", type=int, default=120)
    ap.add_argument("--quiet", type=float, default=0.9)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()
    while True:
        p = probe()
        p["quiet"] = p["spin_sec"] < args.quiet
        with open(args.out, "a") as f:
            f.write(json.dumps(p) + "\n")
        print(json.dumps(p), flush=True)
        if args.once:
            return 0 if p["quiet"] else 1
        time.sleep(args.interval)


if __name__ == "__main__":
    raise SystemExit(main())
