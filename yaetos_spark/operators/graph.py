"""Iterative graph operators — connected components for dedup clusters.

Near-dup pair generation (MinHash-LSH, SimHash, embedding cosine)
yields EDGES; turning them into duplicate CLUSTERS (pick one canonical
doc per group) is a connected-components problem. This is the standard
iterative min-label-propagation on DataFrames: each round every node
adopts the smallest component label among itself and its neighbors;
rounds needed = graph diameter (tiny for near-dup clusters).

Scale notes: each iteration is two equi-joins + one aggregation on the
edge list — all shuffle-partitioned by node id; labels are checkpointed
(localCheckpoint) every few rounds so the lineage doesn't grow
unboundedly. For web-scale graphs swap in the large-star/small-star
variant; for dedup clusters this converges in 2-4 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = smallest node id reachable."""
    # persist the edge list first: building the symmetric closure and
    # the initial labels would otherwise recompute the (often
    # expensive) pair-generation plan once per branch
    edges = edges.select(F.col(src).alias("id1"), F.col(dst).alias("id2")).persist()
    sym = (
        edges.select(F.col("id1").alias("a"), F.col("id2").alias("b"))
        .unionByName(edges.select(F.col("id2").alias("a"), F.col("id1").alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    for i in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
                (F.coalesce("nbr_comp", F.col("comp")) < F.col("comp")).alias("_changed"),
            )
            .persist()
        )
        # materialize the new generation BEFORE dropping the old one so
        # the convergence probe doesn't recompute the whole lineage
        n_changed = new_labels.filter("_changed").count()
        labels.unpersist()
        labels = new_labels.drop("_changed")
        if (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
        if n_changed == 0:
            break
    sym.unpersist()
    edges.unpersist()
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """All docs with their duplicate-cluster id: docs in a near-dup
    pair get component = min doc id of the cluster; singletons are
    their own cluster. Downstream keeps ``cluster_id == doc_id`` rows
    for an exact-one-survivor dedup."""
    comps = connected_components(pairs)
    return (
        df.select(F.col(id_col))
        .join(comps, df[id_col] == comps.node, "left")
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
        )
    )
