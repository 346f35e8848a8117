"""Identity gate + interleaved A/B for the r12 lsh_ann_pairs rewrite.

OLD shape (inlined verbatim from the r11 tree): full LSH candidate
generation (8 bucket self-joins, union, distinct) + exact-cosine
verify, left-joined to the brute-force true pairs.
NEW shape: the committed query (bucket-array agreement test on the
true pairs only).

Identity: the single output row (n_true_pairs, recall_ok) must be
EQUAL at every SF before any timing.  n_found is additionally printed
for both arms (it is not part of the output; the analytical argument
says new >= old with equality except at 1-ulp cosine boundaries).

Usage: python tools/ab_lsh_ann.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from yaetos_spark.operators import similarity as S  # noqa: E402
from yaetos_spark.session import get_spark, materialize_fully  # noqa: E402

_NEAR_DUP_COS = entrymod._NEAR_DUP_COS


def old_query(spark, sf_dir):
    emb = entrymod._tp(spark, sf_dir, "embeddings")
    lsh = (
        S.lsh_near_dup_pairs(
            emb, dim=64, threshold=_NEAR_DUP_COS, n_planes=2, n_tables=8
        )
        .select("id1", "id2")
        .withColumn("_hit", F.lit(1))
    )
    brute = S.embedding_near_dup_pairs(emb, threshold=_NEAR_DUP_COS).select("id1", "id2")
    return brute.join(lsh, ["id1", "id2"], "left").agg(
        F.count(F.lit(1)).alias("n_true_pairs"),
        F.count("_hit").alias("n_found"),
    ).select(
        "n_true_pairs",
        "n_found",
        (F.col("n_found") >= 0.8 * F.col("n_true_pairs")).alias("recall_ok"),
    )


def new_found(spark, sf_dir):
    """The committed query, with n_found kept for the comparison."""
    emb = entrymod._tp(spark, sf_dir, "embeddings")
    brute = S.embedding_near_dup_pairs(emb, threshold=_NEAR_DUP_COS).select("id1", "id2")
    brute = brute.localCheckpoint(eager=True)
    pair_ids = (
        brute.select(F.col("id1").alias("vec_id"))
        .unionByName(brute.select(F.col("id2").alias("vec_id")))
        .distinct()
    )
    asg = S.lsh_bucket_arrays(
        emb.join(F.broadcast(pair_ids), "vec_id", "left_semi"),
        dim=64, n_planes=2, n_tables=8,
    ).select("vec_id", "buckets")
    b1 = asg.select(F.col("vec_id").alias("id1"), F.col("buckets").alias("_bk1"))
    b2 = asg.select(F.col("vec_id").alias("id2"), F.col("buckets").alias("_bk2"))
    hit = F.exists(F.zip_with("_bk1", "_bk2", lambda x, y: x == y), lambda z: z)
    return (
        brute.join(F.broadcast(b1), "id1")
        .join(F.broadcast(b2), "id2")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.coalesce(F.sum(hit.cast("long")), F.lit(0)).alias("n_found"),
        )
        .select(
            "n_true_pairs",
            "n_found",
            (F.col("n_found") >= 0.8 * F.col("n_true_pairs")).alias("recall_ok"),
        )
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab_lsh_ann")
    qs = entrymod.queries()

    # -- identity gate at every SF the driver grades ------------------
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        o = old_query(spark, sf_dir).collect()[0]
        n = new_found(spark, sf_dir).collect()[0]
        c = qs["lsh_ann_pairs"](spark, sf_dir).collect()[0]
        spark.catalog.clearCache()
        print(f"sf{sf}: old (n_true={o.n_true_pairs}, n_found={o.n_found}, "
              f"ok={o.recall_ok}) | new (n_true={n.n_true_pairs}, "
              f"n_found={n.n_found}, ok={n.recall_ok})", flush=True)
        assert (o.n_true_pairs, o.recall_ok) == (n.n_true_pairs, n.recall_ok), (o, n)
        assert (c.n_true_pairs, c.recall_ok) == (o.n_true_pairs, o.recall_ok), (c, o)
    print("identity gate PASSED (output rows equal at all SFs)", flush=True)

    # -- interleaved timing at sf0.1 ----------------------------------
    sf_dir = "/root/testdata/sf0.1"
    for fn in (old_query, lambda s, d: qs["lsh_ann_pairs"](s, d)):  # warm both
        materialize_fully(fn(spark, sf_dir))
        spark.catalog.clearCache()
    olds, news = [], []
    for _ in range(reps):
        for fn, sink in ((old_query, olds), (lambda s, d: qs["lsh_ann_pairs"](s, d), news)):
            t0 = time.time()
            materialize_fully(fn(spark, sf_dir))
            sink.append(time.time() - t0)
            spark.catalog.clearCache()
    o, n = statistics.median(olds), statistics.median(news)
    print(f"old {round(o,3)}s {[round(x,2) for x in olds]} | "
          f"new {round(n,3)}s {[round(x,2) for x in news]} | "
          f"ratio {round(n/o,3)}", flush=True)


if __name__ == "__main__":
    main()
