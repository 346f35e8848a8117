"""Streaming incremental corpus dedup — continuous document ingestion
through a persisted minhash-signature index, exactly-once.

The production shape for a training corpus that grows forever: each
micro-batch is deduplicated WITHIN itself (exact n-gram Jaccard, the
full ``drop_near_duplicates`` semantics) and AGAINST everything already
accepted (banded-LSH candidates over the signature index — the index
stores ``num_hashes`` longs per doc, never text, so the 100 TB corpus
is never re-scanned). Survivors and their signatures land atomically
per batch.

Exactly-once: ``foreachBatch`` is at-least-once, and naive appends
would break a replay twice over — the replayed batch's own signatures
from the failed attempt are already in the index, so every replayed doc
would "collide" with itself (estimated Jaccard 1.0) and be dropped; and
the index would hold its signatures twice. Same recipe as
``upsert.append_batch_exactly_once`` / ``sketch_batch_exactly_once``:
each batch writes survivors and signatures into its OWN ``_batch_id``
partition via dynamic partition overwrite (replay rewrites identical
content — the dedup decisions are deterministic), and the
against-index read EXCLUDES the current batch id (partition-pruned
scan), so a replay sees exactly the pre-batch index state.

Scale notes: the per-batch work is the batch-sized shingle join plus
one band-keyed equi-join against the index band rows — linear in batch
size and index size, all shuffle-partitioned; the index read prunes the
replay partition at the directory level. Compaction of many small batch
partitions is layout work for ``jobs/generic/compact_job.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yaetos_spark.operators.dedup import (
    drop_near_duplicates,
    filter_against_signatures,
    minhash_signatures,
)
from yaetos_spark.plans.paths import dataset_exists, list_file_names

BATCH_COL = "_batch_id"


def last_committed_batch(spark, checkpoint_dir: str) -> int | None:
    """Highest batch id with a COMMIT recorded in the streaming
    checkpoint (the files under ``<checkpoint>/commits`` are named by
    batch id; Spark writes one only after the batch's foreachBatch
    completed). Batches above this id may have written sink data in an
    attempt whose commit never landed — exactly the ones a restart
    replays, so exactly the ones compaction must leave alone. None =
    nothing committed yet."""
    commits = checkpoint_dir.rstrip("/") + "/commits"
    ids = []
    for name in list_file_names(commits, spark):
        try:
            ids.append(int(name))
        except ValueError:  # .tmp / metadata entries
            continue
    return max(ids, default=None)


def _dynamic_overwrite(df: DataFrame, out_dir: str, batch_id: int) -> None:
    spark = df.sparkSession
    stamped = df.withColumn(BATCH_COL, F.lit(int(batch_id)))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        stamped.write.mode("overwrite").partitionBy(BATCH_COL).parquet(out_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def dedup_batch_exactly_once(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    survivors_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
) -> None:
    """Process one micro-batch: within-batch dedup → drop docs whose
    signature-estimated Jaccard clears ``threshold`` against the index
    (excluding this batch's own partition — the replay guard) → land
    survivors and their signatures in this batch's partitions."""
    spark = batch_df.sparkSession
    within = drop_near_duplicates(batch_df, text_col, id_col, n, threshold)
    new_sigs = minhash_signatures(
        within, text_col, id_col, n, num_hashes
    ).localCheckpoint(eager=True)

    # cold start is detected by an EXPLICIT existence check, never by
    # catching the read error: a bare except here would also swallow
    # permission failures, corrupt footers, and transient FS errors,
    # silently skipping cross-batch dedup for the batch and admitting
    # duplicates into the corpus forever ("raise, don't mislabel" —
    # same standard as graph.py's non-convergence guard). A failed
    # read of an EXISTING index now fails the batch, and the stream's
    # at-least-once retry re-runs it.
    have_index = dataset_exists(index_dir, spark)
    if have_index:
        old_sigs = spark.read.parquet(index_dir).where(
            F.col(BATCH_COL) != int(batch_id)
        )
        survivors = filter_against_signatures(
            within, new_sigs, old_sigs, id_col, threshold, num_hashes, bands
        )
    else:
        survivors = within
    # materialize the decisions ONCE so the two writes below cannot
    # diverge (both consume this frame, not the live plan)
    survivors = survivors.localCheckpoint(eager=True)

    surv_sigs = new_sigs.join(
        survivors.select(F.col(id_col).alias("id")), "id", "left_semi"
    )
    _dynamic_overwrite(survivors, survivors_dir, batch_id)
    _dynamic_overwrite(surv_sigs, index_dir, batch_id)


def streaming_dedup(
    stream_df: DataFrame,
    index_dir: str,
    survivors_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
):
    """Attach the exactly-once dedup sink to a document stream; returns
    the started query (availableNow — drain what exists, then stop; a
    long-lived service uses a processingTime trigger instead)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        dedup_batch_exactly_once(
            batch_df,
            batch_id,
            index_dir,
            survivors_dir,
            text_col,
            id_col,
            n,
            threshold,
            num_hashes,
            bands,
        )

    return (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_survivors(spark, survivors_dir: str) -> DataFrame:
    """The accepted corpus so far (all batch partitions)."""
    return spark.read.parquet(survivors_dir).drop(BATCH_COL)


def compact_index(spark, index_dir: str, checkpoint_dir: str) -> None:
    """Fold the COMMITTED batch partitions of the signature index into
    a single ``_batch_id=-1`` history partition, so the against-index
    scan stays O(1) partitions as batches accumulate (same recipe as
    ``sketch.compact_count_min``). Run it between streaming runs.

    Only partitions whose batch id is <= the checkpoint's last COMMITTED
    batch (``last_committed_batch``) are folded; anything above stays in
    its own partition. This is what keeps the exactly-once replay guard
    sound across compaction: a batch written by a FAILED attempt (sink
    data landed, checkpoint commit did not) will be REPLAYED on restart,
    and its replay excludes its own signatures via the
    ``_batch_id != batch_id`` partition filter — if compaction had
    folded that partition into -1, every replayed doc would collide
    with its own failed-attempt signature at estimated Jaccard 1.0 and
    the whole batch would silently vanish. Folding only committed
    batches is safe precisely because committed batches are never
    replayed.

    localCheckpoint before the static overwrite avoids the
    read-own-input hazard; re-running compaction is idempotent. The
    write pins ``partitionOverwriteMode=static`` (full-directory
    replace): under an ambient ``dynamic`` setting the overwrite would
    only replace the partitions present in ``merged`` — with an
    already-compacted index that is just -1, leaving every stale batch
    partition in place (duplicated signatures, and a surviving stale
    partition re-exposes the self-collision replay drop)."""
    last = last_committed_batch(spark, checkpoint_dir)
    if last is None:
        # nothing committed: every batch partition is potentially a
        # failed attempt awaiting replay — folding any would break the
        # replay guard, so there is nothing safe to compact
        return
    idx = spark.read.parquet(index_dir)
    fold = (
        idx.where(F.col(BATCH_COL) <= F.lit(int(last)))
        .drop(BATCH_COL)
        .withColumn(BATCH_COL, F.lit(-1))
    )
    keep = idx.where(F.col(BATCH_COL) > F.lit(int(last)))
    merged = fold.unionByName(keep).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        merged.write.mode("overwrite").partitionBy(BATCH_COL).parquet(index_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
