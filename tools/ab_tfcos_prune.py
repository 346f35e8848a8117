"""Interleaved A/B for the tf_cosine_pairs singleton join-side prune
(r11 optimization round; guide §1.2 same-session interleaving so both
arms share the host noise).

OLD arm = the pre-change operator shape (anti-join hot-term drop, both
self-join sides carry df_count==1 terms), inlined below verbatim from
the pre-change tree.  NEW arm = the shipped operator.  The tool first
asserts the two arms produce the identical pair set (id1, id2, dot,
cos_sim) at the measured scale, then times `reps` interleaved
repetitions of the full `tfcosine_doc_pairs` entry query via
materialize_fully.

Usage: python tools/ab_tfcos_prune.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from yaetos_spark import operators  # noqa: E402
from yaetos_spark.operators import text as TX  # noqa: E402
from yaetos_spark.session import get_spark, materialize_fully  # noqa: E402


def tf_cosine_pairs_old(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    *,
    max_df: int | None,
) -> DataFrame:
    """Pre-change shape (verbatim): max_df via left_anti hot-term join,
    self-join sides NOT pruned of singleton terms."""
    toks = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != "")
    rows = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
    tf = rows.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    if max_df:
        hot = (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df_count"))
            .filter(F.col("df_count") > max_df)
            .select("term")
        )
        tf = tf.join(hot, "term", "left_anti")
    tf = tf.persist()
    norms = tf.groupBy("id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
    a, b = tf.alias("a"), tf.hint("merge").alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot"))
    )
    n1 = norms.select(F.col("id").alias("id1"), F.col("n2").alias("n2_1"))
    n2 = norms.select(F.col("id").alias("id2"), F.col("n2").alias("n2_2"))
    return (
        dots.join(n1.hint("merge"), "id1")
        .join(n2.hint("merge"), "id2")
        .withColumn(
            "cos_sim",
            F.round(
                F.col("dot")
                / F.sqrt(F.col("n2_1").cast("double") * F.col("n2_2").cast("double")),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id1", "id2", "dot", "cos_sim")
    )


NEW_IMPL = TX.tf_cosine_pairs


def _set_impl(impl):
    # the entry query resolves TX.tf_cosine_pairs at call time
    TX.tf_cosine_pairs = impl
    operators.text.tf_cosine_pairs = impl


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_tfcos_prune")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    qs = entrymod.queries()

    # identity gate first: byte-equal pair sets or no measurement
    rows = {}
    for label, impl in (("old", tf_cosine_pairs_old), ("new", NEW_IMPL)):
        _set_impl(impl)
        rows[label] = sorted(
            (r.id1, r.id2, r.dot, r.cos_sim)
            for r in qs["tfcosine_doc_pairs"](spark, sf_dir).collect()
        )
        spark.catalog.clearCache()
    assert rows["old"] == rows["new"], (
        f"IDENTITY FAILED: {len(rows['old'])} old vs {len(rows['new'])} new rows"
    )
    print(f"identity ok: {len(rows['new'])} pairs at {sf_dir}", flush=True)

    old_t, new_t = [], []
    for label, impl in (("old", tf_cosine_pairs_old), ("new", NEW_IMPL)):
        _set_impl(impl)  # warm both arms (codegen)
        materialize_fully(qs["tfcosine_doc_pairs"](spark, sf_dir))
        spark.catalog.clearCache()
    for _ in range(reps):
        for impl, sink in ((tf_cosine_pairs_old, old_t), (NEW_IMPL, new_t)):
            _set_impl(impl)
            t0 = time.time()
            materialize_fully(qs["tfcosine_doc_pairs"](spark, sf_dir))
            sink.append(time.time() - t0)
            spark.catalog.clearCache()
    _set_impl(NEW_IMPL)
    a, b = statistics.median(old_t), statistics.median(new_t)
    print(f"old median {a:.3f}s {[round(t, 3) for t in old_t]}")
    print(f"new median {b:.3f}s {[round(t, 3) for t in new_t]}")
    print(f"ratio new/old = {b / a:.3f}")


if __name__ == "__main__":
    main()
