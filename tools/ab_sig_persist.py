"""A/B: do the signature frames feeding LSH/simhash band self-joins
recompute once per join side, and does persisting them pay?

In minhash_lsh_pairs the signature aggregation (tokenize + md5 + K
min-aggregates) appears TWICE in the static plan — once per self-join
side of lsh_candidates. AQE's runtime stage reuse MAY dedupe the two
identical exchanges; this measures whether an explicit persist of the
signature frame (one row per doc — the smallest reusable frame) beats
relying on that.  Same question for simhash_pairs' signature frame.

Arms, interleaved in one session (pair sets asserted equal first):
  cur  = committed operators unchanged
  sigp = signatures persisted before banding (minhash) / simhash frame
         persisted before band explode

Usage: python tools/ab_sig_persist.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark.operators import dedup as D  # noqa: E402
from yaetos_spark.operators.dedup import (  # noqa: E402
    _minhash_sigs_from_rows,
    lsh_candidates,
)
from yaetos_spark.functions.shingles import word_ngram_rows  # noqa: E402
from yaetos_spark.session import get_spark, materialize_fully  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def minhash_cur(spark):
    docs = entrymod._tp(spark, SF_DIR, "documents")
    return D.minhash_lsh_pairs(docs, n=3, num_hashes=16, bands=4, threshold=0.2)


def minhash_sigp(spark):
    """minhash_lsh_pairs with ONE added persist on the signature frame."""
    docs = entrymod._tp(spark, SF_DIR, "documents")
    id_col, text_col, n, num_hashes, bands, threshold = "doc_id", "text", 3, 16, 4, 0.2
    rows = word_ngram_rows(docs, text_col, id_col, n)
    sigs = _minhash_sigs_from_rows(rows, num_hashes).persist()
    cands = lsh_candidates(sigs, num_hashes, bands).persist()
    cand_ids = (
        cands.select(F.col("id1").alias(id_col))
        .unionByName(cands.select(F.col("id2").alias(id_col)))
        .distinct()
    )
    cand_docs = docs.join(cand_ids, id_col, "left_semi")
    from yaetos_spark.operators.dedup import shingle_arrays

    arrs = shingle_arrays(cand_docs, text_col, id_col, n, None)
    s1 = arrs.select(F.col("id").alias("id1"), F.col("sh").alias("sh1"))
    s2 = arrs.select(F.col("id").alias("id2"), F.col("sh").alias("sh2"))
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1", "id2",
            F.size(F.array_intersect("sh1", "sh2")).alias("n_common"),
            F.size("sh1").alias("n1"), F.size("sh2").alias("n2"),
        )
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= 0.2)
        .select("id1", "id2", "jaccard")
    )


def simhash_cur(spark):
    docs = entrymod._t(spark, SF_DIR, "documents").where(F.col("doc_id") % 10 == 0)
    sim = D.simhash(docs)
    return D.simhash_pairs(sim, max_hamming=3, bits=32, bands=4)


def simhash_sigp(spark):
    docs = entrymod._t(spark, SF_DIR, "documents").where(F.col("doc_id") % 10 == 0)
    sim = D.simhash(docs).persist()
    return D.simhash_pairs(sim, max_hamming=3, bits=32, bands=4)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab_sig_persist")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    import __spark_entry__ as e

    mod = e._SIMHASH_SUBSET_MOD
    assert mod == 10, f"subset mod changed ({mod}); update simhash arms"

    for pair_name, arms in (
        ("minhash_lsh_pairs", (minhash_cur, minhash_sigp)),
        ("simhash_near_pairs", (simhash_cur, simhash_sigp)),
    ):
        # identity gate
        a = {tuple(r) for r in arms[0](spark).collect()}
        b = {tuple(r) for r in arms[1](spark).collect()}
        spark.catalog.clearCache()
        assert a == b, (pair_name, len(a), len(b))
        print(f"{pair_name}: identity OK ({len(a)} rows)", flush=True)
        # interleaved timing
        for fn in arms:  # warm
            materialize_fully(fn(spark))
            spark.catalog.clearCache()
        cur_t, sigp_t = [], []
        for _ in range(reps):
            for fn, sink in ((arms[0], cur_t), (arms[1], sigp_t)):
                t0 = time.time()
                materialize_fully(fn(spark))
                sink.append(time.time() - t0)
                spark.catalog.clearCache()
        c, s = statistics.median(cur_t), statistics.median(sigp_t)
        print(f"{pair_name}: cur {round(c,3)}s {[round(x,2) for x in cur_t]} | "
              f"sigp {round(s,3)}s {[round(x,2) for x in sigp_t]} | ratio {round(s/c,3)}",
              flush=True)


if __name__ == "__main__":
    main()
