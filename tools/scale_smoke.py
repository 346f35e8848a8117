"""10x scale smoke — measure how the heavy queries GROW, not just run.

The per-round scale audit (tools/scale_audit.py) proves every query
executes at sf0.1; this tool answers the next question the 100 TB
design review asks: when the fact tables grow 10x, does each heavy
query's cost grow ~linearly (healthy shuffle-bound plan) or blow up
(hidden quadratic pair generation, driver collect, skew)?

It materializes a synthetic 10x dataset from a base sf dir by
replicating the FACT tables (orders, lineitem, events, documents,
embeddings) with shifted primary keys — dimensions stay fixed, like
real growth (more orders per customer, more docs per source). Two
details keep the replication honest:

- document text gets a per-copy suffix on EVERY word, so copies share
  zero shingles with the original — otherwise LSH/dedup queries would
  see a fabricated quadratic pair explosion (10 near-identical copies
  = 45 cross-copy pairs per doc) that says nothing about real growth;
- embeddings get a small deterministic per-copy, per-dimension
  perturbation so ANN queries see 10x distinct vectors, not 10
  rescaled clones.

Then it runs a fixed set of heavy + headline queries against the base
dir and the 10x dir and records sec/rows at each scale plus the
ratios. A time ratio well beyond ~10x (after the fixed session cost)
flags a super-linear plan. Output: SCALE_SMOKE_10X.json at the repo
root.

Usage:
    python tools/scale_smoke.py [base_sf_dir] [--repl N] [--out PATH]

Defaults: base=$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, repl=10,
out=SCALE_SMOKE_10X.json. The replica is built under /tmp and reused
across runs when already present for the same base+repl.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark.session import get_spark  # noqa: E402
from yaetos_spark.sources.tables import TABLE_NAMES, load_table  # noqa: E402

from scale_audit import _env_signal, run_audit  # noqa: E402

# fact tables replicate with a key shift; everything else copies as-is
KEY_OFF = 100_000_000

SMOKE_QUERIES = [
    # the heavy five (iterative / pair-generating / multi-ntile)
    "rfm_segments",
    "pagerank_trade_graph",
    "near_dup_survivors",
    "ivf_ann_exactprobe",
    "dedup_clusters",
    # high-diameter star-CC (r7): events grow 10x as LONGER per-user
    # chains, so this is the growth direction the O(log n) operator
    # exists for — rounds grow logarithmically while per-round work
    # grows linearly
    "chain_components",
    # r9: the skew_robust phase mode (partial-agg groupBy+join) on the
    # same growth direction — evidence the robust plan scales too
    "chain_components_robust",
    # pair-generating dedup + similarity paths
    "minhash_lsh_pairs",
    "simhash_docs",
    "dedup_exact_norm",
    "ann_cosine_topk",
    # r10: the Arrow rolling-hash winnowing production path — the
    # mapInPandas stage must grow linearly like the SQL variant does
    "winnow_rolling_pairs",
    # r9: the two late-round text-path rewrites — winnow's groupBy
    # doc-frequency guard and the one-pass corpus line dedup — tracked
    # here so their growth ratios refresh automatically per round
    "winnow_overlap_pairs",
    "corpus_line_dedup",
    # r9: the #1 SCALE_AUDIT query (two parallel-submitted batch dedup
    # pipelines + cross-batch signature filter) — its growth ratio was
    # previously hand-measured per round; now automatic
    "incremental_dedup_survivors",
    # r11: DSIR gram-explosion scan (persisted once, consumed twice) +
    # broadcast weight join — the gram fan-out must grow linearly and
    # the forced weight-frame broadcast stays n_buckets-bounded at any
    # scale, which is exactly what this smoke exists to demonstrate
    "dsir_scores",
    # shuffle-heavy relational / sessionization staples
    "pricing_summary",
    "topk_revenue",
    "sessionize_events",
]


def build_replica(spark, base: str, out_dir: str, repl: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    copies = spark.range(repl).withColumnRenamed("id", "_k")

    def replicate(name: str, shift_cols: list[str], extra=None):
        df = load_table(spark, base, name).crossJoin(F.broadcast(copies))
        for c in shift_cols:
            df = df.withColumn(c, F.col(c) + F.col("_k") * F.lit(KEY_OFF))
        if extra is not None:
            df = extra(df)
        # LAYOUT MATTERS: the crossJoin preserves the BASE table's
        # partitioning, so a single-file base table (documents at
        # sf0.1) became ONE parquet row group holding every replicated
        # row — an unsplittable scan that serialized every document-
        # reading query onto one core and measured the file layout,
        # not the plan (winnow at 100x read 614s of which ~2/3 was the
        # one-task scan). A real 100 TB table is thousands of files;
        # hash-repartition on the shifted key for a deterministic,
        # parallel layout.
        df = df.repartition(32, F.col(shift_cols[0]))
        df.drop("_k").write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    def doc_extra(df):
        # Re-letter every copy with its own seeded BIJECTIVE character
        # permutation (a-z and 0-9 separately, via translate): an
        # isomorphic renaming of the whole corpus.  Copy 0 stays
        # verbatim.
        #
        # Why a bijection and not a word suffix (the r6-r10 approach):
        # copies must share ZERO word shingles (a trailing tag leaves
        # long docs ~identical and fabricates cross-copy near-dup
        # pairs that measure replication, not growth) — but they must
        # also preserve CHAR-GRAM statistics, which any suffix
        # destroys two ways, both measured at 10x this round:
        #   - a constant per-copy suffix ('c5') repeats at every word
        #     boundary: distinct winnow fingerprints fell 6,579 (base)
        #     -> 1,217 per copy, median doc-freq rose 19 -> 289;
        #   - even a word-varying salt lengthens 5-char words past
        #     k=8, so char-grams land INSIDE words and every
        #     occurrence of a vocabulary word corpus-wide shares them
        #     (median freq exploded again).
        # In both cases the winnowing family's hot-fingerprint guard
        # then correctly dropped everything: replica copies produced
        # ZERO near-dup pairs (241 base pairs -> 241+1 at 10x), so the
        # smokes measured the fingerprint scan and never the pair
        # join.  A character bijection preserves word lengths,
        # boundary structure, and the entire gram-frequency
        # distribution exactly (grams map 1:1), while making copies
        # disjoint at BOTH the word and the char-gram level.
        import random
        import string

        alpha, digs = string.ascii_lowercase, string.digits
        branches = []
        for c in range(1, repl):
            rng = random.Random(c)
            pa = list(alpha)
            rng.shuffle(pa)
            pd = list(digs)
            rng.shuffle(pd)
            branches.append(
                f"WHEN {c} THEN translate(text, '{alpha + digs}', "
                f"'{''.join(pa) + ''.join(pd)}')"
            )
        case = "CASE _k " + " ".join(branches) + " ELSE text END"
        return df.withColumn("text", F.expr(case)).withColumn("n_chars", F.length("text").cast("long"))

    def emb_extra(df):
        # deterministic small perturbation, different per copy and dim
        return df.withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, i) -> cast(x + 0.01 * cast(_k as double)"
                " * (pmod(vec_id + i, 7) - 3) as float))"
            ),
        )

    replicate("orders", ["o_orderkey"])
    replicate("lineitem", ["l_orderkey"])
    replicate(
        "events",
        ["event_id"],
        # nudge timestamps per copy so replicated events interleave
        lambda df: df.withColumn(
            "ts", F.col("ts") + F.make_interval(secs=F.col("_k").cast("int"))
        ),
    )
    replicate("documents", ["doc_id"], doc_extra)
    replicate("embeddings", ["vec_id"], emb_extra)
    for name in TABLE_NAMES:
        if name not in ("orders", "lineitem", "events", "documents", "embeddings"):
            load_table(spark, base, name).write.mode("overwrite").parquet(
                f"{out_dir}/{name}.parquet"
            )
    with open(os.path.join(out_dir, "_REPLICA.json"), "w") as f:
        json.dump({"base": base, "repl": repl, "layout": 2}, f)


def main(argv: list[str]) -> int:
    out_path = os.path.join(REPO, "SCALE_SMOKE_10X.json")
    repl = 10
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--repl" in argv:
        i = argv.index("--repl")
        repl = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    base = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    env_before = _env_signal()
    spark = get_spark(app_name="scale_smoke")

    replica = f"/tmp/yaetos_spark_scale_smoke_x{repl}"
    marker = os.path.join(replica, "_REPLICA.json")
    t0 = time.time()
    reused = False
    if os.path.exists(marker):
        with open(marker) as f:
            m = json.load(f)
        reused = (
            m.get("base") == base
            and m.get("repl") == repl
            and m.get("layout") == 2  # pre-layout-2 replicas have the
            # single-row-group scan bottleneck; rebuild them
        )
    if not reused:
        build_replica(spark, base, replica, repl)
    build_sec = round(time.time() - t0, 1)

    t0 = time.time()
    base_res = run_audit(spark, base, SMOKE_QUERIES)
    base_sec = round(time.time() - t0, 1)
    t0 = time.time()
    big_res = run_audit(spark, replica, SMOKE_QUERIES)
    big_sec = round(time.time() - t0, 1)

    queries = {}
    for name in SMOKE_QUERIES:
        b, g = base_res[name], big_res[name]
        queries[name] = {
            "base": b,
            "scaled": g,  # the x{repl} run (repl recorded top-level)
            "time_ratio": round(g["sec"] / b["sec"], 1) if b["sec"] else None,
            # either side may have errored (rows=None) — report the
            # error through `errors` below instead of crashing the tool
            "row_ratio": (
                round(g["rows"] / b["rows"], 2)
                if b.get("rows") and g.get("rows") is not None
                else None
            ),
        }
    errs = [n for n, q in queries.items() if q["base"]["err"] or q["scaled"]["err"]]
    doc = {
        "base_sf_dir": base,
        "repl": repl,
        "replica_reused": reused,
        "replica_build_sec": build_sec,
        "env_before": env_before,
        "env_after": _env_signal(),
        "base_total_sec": base_sec,
        "scaled_total_sec": big_sec,
        "n_errors": len(errs),
        "errors": errs,
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(
        f"wrote {out_path}: {len(queries)} queries, base {base_sec}s -> "
        f"x{repl} {big_sec}s, {len(errs)} errors"
    )
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
