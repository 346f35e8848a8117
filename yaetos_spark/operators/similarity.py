"""Similarity search over embedding columns (array<float>).

Brute-force cosine is the exact baseline; the scale paths are (a)
random-hyperplane LSH bucketing and (b) IVF-style coarse quantization —
both turn the all-pairs cross join into an equi-join on a bucket key.

Execution strategy: the reference side of every brute-force operator
(query set / full corpus snapshot) is shipped to executors as a numpy
matrix via a Spark broadcast, and the big side streams through an
Arrow-batched ``mapInPandas`` doing one BLAS matmul per batch — orders
of magnitude faster than per-pair expression evaluation, no shuffle of
the corpus, and partial top-k is reduced per batch before the final
(tiny) global window.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yaetos_spark.functions.vectors import cosine, dot, norm


# Hard cap on rows collected to the driver by the brute-force paths.
# ~4M rows × 64 float64 dims ≈ 2 GiB — beyond that the caller must use
# the bucketed scale paths instead of silently OOMing the driver.
MAX_COLLECT_ROWS = 4_000_000


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str, max_rows: int = MAX_COLLECT_ROWS):
    """Small-side (id array, row-normalized matrix) for broadcasting.
    The caller guarantees this side fits on one node (same contract as
    ``F.broadcast``); the guard enforces it inside the SAME collect job:
    the limit stops the transfer at ``max_rows + 1`` rows, and one extra
    row proves the overflow — the full corpus is never shipped."""
    pdf = df.select(id_col, vec_col).limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"brute-force similarity would collect >{max_rows:,} rows to the "
            "driver; use the bucketed scale paths instead "
            "(lsh_near_dup_pairs / ivf_topk)"
        )
    ids = pdf[id_col].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    return ids, mat / norms[:, None]


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    ``queries`` (small) is broadcast as a normalized numpy matrix; the
    corpus streams through ``mapInPandas``, each Arrow batch scoring
    against all queries with one matmul and emitting only its LOCAL
    top-k per query. The global top-k reduces partitions×k candidate
    rows — not the corpus. Ties broken by neighbor id (deterministic).
    """
    spark = emb.sparkSession
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        for pdf in batches:
            n_ids = pdf[id_col].to_numpy()
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.sqrt((mat * mat).sum(axis=1))
            norms[norms == 0] = 1.0
            sims = (mat / norms[:, None]) @ mat_q.T  # (batch, n_queries)
            out = []
            for qi, qid in enumerate(ids_q):
                col = sims[:, qi]
                mask = n_ids != qid
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) > k:
                    # local partial top-k: keep the k best of this batch
                    part = cand_idx[np.argpartition(-col[cand_idx], k - 1)[:k]]
                else:
                    part = cand_idx
                for i in part:
                    out.append((int(qid), int(n_ids[i]), float(col[i])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cos"])

    scored = emb.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"), "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (exact, brute force).

    The corpus snapshot is broadcast once as a normalized matrix; each
    streaming batch does one matmul against it and emits only pairs
    above threshold with id1 < id2. Quadratic in corpus size — the
    correct baseline; use :func:`lsh_near_dup_pairs` when the corpus
    no longer fits a broadcast.
    """
    spark = emb.sparkSession
    ids, mat = _collect_matrix(emb, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, mat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for pdf in batches:
            b_ids = pdf[id_col].to_numpy()
            bmat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.sqrt((bmat * bmat).sum(axis=1))
            norms[norms == 0] = 1.0
            sims = (bmat / norms[:, None]) @ all_mat.T  # (batch, corpus)
            rows, cols = np.nonzero((sims >= threshold) & (b_ids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id1": b_ids[rows].astype("int64"),
                    "id2": all_ids[cols].astype("int64"),
                    "cos": sims[rows, cols],
                }
            )

    scored = emb.select(id_col, vec_col).mapInPandas(score, schema="id1 long, id2 long, cos double")
    return scored.select("id1", "id2", F.round("cos", 6).alias("cos_sim"))


# -- scale paths ------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bucket_expr(dim: int, n_planes: int, seed: int, vec_col: str):
    """Column expression for one LSH table's bucket id (see
    :func:`lsh_bucket_ids`)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        # one py4j call per plane (element-wise F.lit would round-trip
        # the gateway dim times per plane — seconds of driver latency)
        plane_col = F.lit([float(x) for x in p]).cast("array<double>")
        bit = F.when(dot(F.col(vec_col), plane_col) > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        bucket = bucket + bit.cast("long")
    return bucket


def lsh_bucket_ids(
    emb: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) bucket id per row.

    sign(v·p_i) bits packed into one long. Vectors in the same bucket
    are near-duplicate candidates; multiple tables (different seeds)
    raise recall. Hyperplanes are plan literals — broadcast for free.
    """
    return emb.withColumn("bucket", _bucket_expr(dim, n_planes, seed, vec_col))


def lsh_bucket_arrays(
    emb: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 2,
    seed0: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Every table's bucket id in ONE scan: adds ``buckets``
    (array<long>, element t = the table-t bucket id). Element t is
    value-identical to ``lsh_bucket_ids(emb, dim, n_planes,
    seed=seed0 + t)`` — same hyperplanes, same sign/packing — so
    "pair (a, b) is an LSH candidate" == "∃t: buckets_a[t] ==
    buckets_b[t]" with exactly :func:`lsh_near_dup_pairs`'s candidate
    rule (unit-tested). Use when the CANDIDATE PREDICATE is needed for
    a known (small) set of pairs — e.g. a recall report over true
    pairs — instead of materializing the full candidate pair set."""
    cols = [
        _bucket_expr(dim, n_planes, seed0 + t, vec_col).cast("long")
        for t in range(n_tables)
    ]
    return emb.withColumn("buckets", F.array(*cols))


def lsh_near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via multi-table hyperplane LSH + exact verify.

    Each table is an equi-join on its bucket key (linear + candidate
    volume, not quadratic); union of candidates, distinct, then exact
    cosine on candidates only.

    Shape note (r11 opt, measured non-finding): consolidating the
    per-table loop into one scan computing every table's bucket id +
    posexplode + ONE self-join on (table, bucket) produces the
    identical pair set but measured 1.5-1.65× SLOWER at sf0.1 — with
    few planes per table the composite key has only
    n_tables × 2^n_planes distinct values, so the single join loses
    the per-table broadcast-join parallelism while the candidate
    volume (the dominant cost) is unchanged. The loop stays.
    """
    cands = None
    for t in range(n_tables):
        bucketed = lsh_bucket_ids(emb, dim, n_planes, seed=42 + t, vec_col=vec_col)
        a = bucketed.select(F.col(id_col).alias("id1"), F.col("bucket"))
        b = bucketed.select(F.col(id_col).alias("id2"), F.col("bucket"))
        pairs = a.join(b, ["bucket"]).filter(F.col("id1") < F.col("id2")).select("id1", "id2")
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()
    v1 = emb.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    v2 = emb.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        cands.join(v1, "id1")
        .join(v2, "id2")
        .withColumn("cos", cosine(F.col("v1"), F.col("v2")))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", F.round("cos", 6).alias("cos_sim"))
    )


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> list[list[float]]:
    """Train IVF coarse centroids with distributed k-means (MLlib).

    Returns plain python centroid lists consumable by
    :func:`ivf_assign` / :func:`ivf_topk`. Training distributes; only
    the (n_cells × dim) centroid matrix comes back to the driver.

    ``init_mode``: MLlib's ``k-means||`` (default — better centroids)
    or ``random`` (skips the ~2 extra full init passes + their driver
    round-trips; right when centroid QUALITY does not matter, e.g. the
    probe-all contract path where any centroid set yields the exact
    result).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    # k-means|| init + every Lloyd iteration is a full pass over the
    # features; uncached, each pass re-scans the source and re-runs the
    # array->vector conversion (MLlib itself warns about uncached
    # input). Scoped persist: measured 4.4 s -> 1.8 s on the first
    # train at sf0.1 (warm-page-cache reps are parity there; at real
    # scale the 2+max_iter re-scans are the dominant training cost).
    feats = feats.persist()
    try:
        model = KMeans(k=n_cells, seed=seed, maxIter=max_iter, initMode=init_mode).fit(feats)
    finally:
        feats.unpersist()
    return [c.tolist() for c in model.clusterCenters()]


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-accelerated top-k: corpus rows are assigned to their nearest
    centroid cell once; each query probes only its ``n_probe`` nearest
    cells, so the exact-cosine work touches ~n_probe/n_cells of the
    corpus — the standard recall/cost dial. Join is an equi-join on
    the cell id (broadcast query side)."""
    import numpy as np

    assigned = ivf_assign(emb, centroids, vec_col=vec_col)
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    cents = np.asarray(centroids, dtype=np.float64)
    cents = cents / np.maximum(np.sqrt((cents * cents).sum(axis=1))[:, None], 1e-12)
    spark = emb.sparkSession
    probe_rows = []
    for qid, qv in zip(q_ids, q_mat):
        cells = np.argsort(-(cents @ qv))[:n_probe]
        probe_rows.extend((int(qid), int(c)) for c in cells)
    probes = spark.createDataFrame(probe_rows, "query_id long, ivf_cell int")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cand = (
        assigned.join(F.broadcast(probes), "ivf_cell")
        .join(F.broadcast(q), "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col(vec_col)))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), F.round("cos", 6).alias("cos_sim"), "rank")
    )


# Above this many cells the literal-expression assignment path would
# build an O(n_cells × dim) Catalyst tree (millions of nodes at the
# 65536-cell end); switch to the broadcast-matrix Arrow path instead.
IVF_EXPR_MAX_CELLS = 256


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest
    centroid (argmax of dot product over normalized centroids; ties go
    to the lowest cell id). Two physical strategies, same semantics:

    - ≤ ``IVF_EXPR_MAX_CELLS`` cells: centroids inline as plan literals
      (whole-stage codegen, no Python), fine for small codebooks.
    - larger codebooks (typically 4096-65536 cells): the (n_cells × dim)
      centroid matrix is broadcast once and each Arrow batch does a
      single BLAS matmul + argmax in ``mapInPandas`` — the plan stays
      O(1) nodes regardless of cell count (same pattern as
      :func:`cosine_topk`)."""
    if len(centroids) <= IVF_EXPR_MAX_CELLS:
        return _ivf_assign_expr(emb, centroids, vec_col)
    return _ivf_assign_arrow(emb, centroids, vec_col)


def _ivf_assign_expr(emb: DataFrame, centroids, vec_col: str) -> DataFrame:
    # flat array-argmax, NOT a nested when-chain: chaining
    # when(score > best).otherwise(prev) embeds the whole previous tree
    # at each step → O(n_cells²·dim) plan nodes (heap/stack death well
    # under 256 cells); the array form is linear and stays codegen'd.
    # array_position takes the FIRST max — same tie rule as np.argmax.
    scores = []
    for cvec in centroids:
        c = F.lit([float(x) for x in cvec]).cast("array<double>")
        scores.append(dot(F.col(vec_col), c) / norm(c))
    arr = F.array(*scores)
    cell = (F.array_position(arr, F.array_max(arr)) - 1).cast("int")
    return emb.withColumn("ivf_cell", cell)


def _ivf_assign_arrow(emb: DataFrame, centroids, vec_col: str) -> DataFrame:
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = emb.sparkSession
    cents = np.asarray(centroids, dtype=np.float64)
    norms = np.sqrt((cents * cents).sum(axis=1))
    norms[norms == 0] = 1.0
    bc = spark.sparkContext.broadcast(cents / norms[:, None])

    out_schema = StructType(
        list(emb.schema.fields) + [StructField("ivf_cell", IntegerType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat_c = bc.value
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf) == 0:
                pdf["ivf_cell"] = np.array([], dtype="int32")
                yield pdf
                continue
            vmat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            scores = vmat @ mat_c.T  # (batch, n_cells)
            # np.argmax takes the FIRST max — same tie rule as the
            # expression path's strict-> update
            pdf["ivf_cell"] = scores.argmax(axis=1).astype("int32")
            yield pdf

    return emb.mapInPandas(assign, schema=out_schema)


def quantize_embeddings(
    emb: DataFrame, vec_col: str = "embedding", bits: int = 8
) -> DataFrame:
    """Symmetric per-vector int quantization — the memory lever for
    ANN at scale (float32 -> int8 is 4x smaller indexes and 4x more
    vectors per broadcast/executor).  Adds ``scale double`` and
    ``qvec array<int>`` with q_i = floor(v_i/scale + 0.5) clamped to
    [-qmax, qmax], scale = max|v|/qmax.  floor(x + 0.5) instead of
    round(): identical halfway behavior in every engine, so the
    quantized values are exactly reproducible (oracle-checkable).
    Reconstruction v ~ q*scale has per-element error <= scale/2.
    Zero vectors get scale 0 and all-zero codes."""
    qmax = (1 << (bits - 1)) - 1
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / qmax
    out = emb.withColumn("scale", scale)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(F.col("scale") == 0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(-qmax),
                F.least(
                    F.lit(qmax),
                    F.floor(x.cast("double") / F.col("scale") + 0.5).cast("int"),
                ),
            )
        ),
    )
    return out.withColumn("qvec", q)


def dequantize_embeddings(qdf: DataFrame) -> DataFrame:
    """Inverse map: qvec*scale -> ``embedding_deq array<double>``."""
    return qdf.withColumn(
        "embedding_deq",
        F.transform(F.col("qvec"), lambda q: q.cast("double") * F.col("scale")),
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    max_cluster_rows: int = 250_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): drop every vector that has a SMALLER-id
    neighbor at cosine >= ``threshold`` within its cluster; return the
    surviving input rows. Min-id survivor selection instead of the
    paper's random exemplar: deterministic, engine-reproducible, and
    the same convention as the text near-dup family.

    The drop rule is deliberately NON-recursive (drop iff any smaller
    similar id exists, surviving or not) so the exact variant has a
    pure-SQL twin (one NOT EXISTS) — the oracle contract. It drops at
    least as much as leader-style greedy selection would and every
    epsilon-ball keeps its min-id member.

    Two physical strategies, one semantic:

    - ``n_clusters=1`` — EXACT: the global pair scan reuses
      :func:`embedding_near_dup_pairs` (broadcast normalized matrix,
      one BLAS matmul per Arrow batch). Quadratic; bounded by the
      MAX_COLLECT_ROWS broadcast guard.
    - ``n_clusters>1`` — the SemDeDup scale path: distributed k-means
      (:func:`train_ivf_centroids`) + cell assignment
      (:func:`ivf_assign`), then the pair scan runs INSIDE each
      cluster via ``applyInPandas`` (one shuffle on the cell id; one
      blocked matmul per cluster, O(m^2 d) flops over m ~ n/k rows).
      Cross-cluster near-pairs are not examined — the paper's
      documented approximation; since clustering can only MISS drop
      evidence, ``exact survivors ⊆ clustered survivors`` always
      (property-tested). Size n_clusters so clusters stay small
      (SemDeDup uses k ~ sqrt(n); 1e9 vectors / 1e5 clusters = 1e4
      rows per cell). A cluster above ``max_cluster_rows`` raises
      with that guidance instead of silently running an O(m^2) task
      for hours — the hot-shingle/hot-block guard pattern.

    Zero vectors: norm coalesces to 1 (cosine 0 against everything),
    matching embedding_near_dup_pairs / the DuckDB oracle.
    """
    if n_clusters <= 1:
        pairs = embedding_near_dup_pairs(
            emb, threshold=threshold, id_col=id_col, vec_col=vec_col
        )
        dropped = pairs.select(F.col("id2").alias(id_col)).distinct()
        return emb.join(dropped, id_col, "left_anti")

    centroids = train_ivf_centroids(
        emb, n_cells=n_clusters, vec_col=vec_col, seed=seed, max_iter=max_iter
    )
    assigned = ivf_assign(emb, centroids, vec_col=vec_col)
    # persist: feeds the hot-cluster guard AND the per-cell pair scan —
    # without it the k-means assignment recomputes per consumer
    assigned = assigned.persist()
    try:
        hot = (
            assigned.groupBy("ivf_cell")
            .agg(F.count(F.lit(1)).alias("_m"))
            .agg(F.max("_m").alias("mx"))
            .collect()[0]
        )
        if (hot.mx or 0) > max_cluster_rows:
            raise ValueError(
                f"semantic_dedup: largest cluster holds {hot.mx:,} rows "
                f"(> max_cluster_rows={max_cluster_rows:,}) — the O(m^2) "
                "within-cluster scan would be a straggler task; raise "
                "n_clusters (SemDeDup uses k ~ sqrt(n)) or max_cluster_rows"
            )

        id_type = dict(emb.dtypes)[id_col]

        def dropped_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf[id_col].to_numpy()
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.sqrt((mat * mat).sum(axis=1))
            norms[norms == 0] = 1.0
            matn = mat / norms[:, None]
            m = len(ids)
            drop = np.zeros(m, dtype=bool)
            # blocked matmul: O(block × m) memory instead of O(m^2)
            blk = 2048
            for s in range(0, m, blk):
                sims = matn[s : s + blk] @ matn.T  # (blk, m)
                hit = (sims >= threshold) & (ids[s : s + blk, None] < ids[None, :])
                drop |= hit.any(axis=0)
            return pdf.loc[drop, [id_col]]

        dropped = assigned.groupBy("ivf_cell").applyInPandas(
            dropped_in_cell, schema=f"{id_col} {id_type}"
        )
        # localCheckpoint, not persist: the anti-join's build side must
        # not re-run k-means assignment if evicted
        dropped = dropped.localCheckpoint(eager=True)
    finally:
        assigned.unpersist()
    return emb.join(dropped, id_col, "left_anti")
