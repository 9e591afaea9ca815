"""Streaming incremental MinHash dedup — the streaming twin of
:func:`lithops_dataframe_spark.operators.dedup.minhash_incremental_dedup`
(VERDICT r7 task 6: the one §2.11 operator family that had no streaming
counterpart).

Shape: each micro-batch of arriving documents is probed against a
STANDING LSH index persisted between batches (band postings + shingle
sets of every document that has ever arrived), then appended to it via
``foreachBatch``. Per-epoch cost is O(batch × bands) probe work against
the index — never index × index — which is what makes continuous dedup
of a 100 TB firehose viable: the index is a partitioned parquet layout
keyed by epoch, each batch writes only its own partition, and the band
postings join is hash-partitioned on the (uniform by construction)
band key.

Two deliberate semantics, documented because they ARE the production
choices:

- **The index keeps every ARRIVED doc, kept or dropped** (a "signature
  graveyard"): a near-dup of an already-dropped doc is still a dup —
  indexing only survivors would re-admit the third copy of a pair.
  Signatures are ~100 bytes/doc, so the graveyard costs nothing
  relative to payloads.
- **Exactly-once across retries by epoch-keyed writes**: decisions and
  index additions land in ``.../epoch=<id>`` with overwrite, and a
  batch probes only partitions with ``epoch < its own id`` — a retried
  micro-batch neither double-indexes itself nor probes its own
  half-written output.

Reference analog: the batch incremental operator covers
``/root/reference``'s dedup surface; the streaming twin has no
reference counterpart (the reference has no streaming engine) and
follows Structured Streaming's standard foreachBatch recipe instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from lithops_dataframe_spark.functions import hashing as H
from lithops_dataframe_spark.operators.dedup import with_minhash
from lithops_dataframe_spark.operators.util import ensure_parallelism
from lithops_dataframe_spark.streaming import fsutil

_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("band_idx", T.IntegerType()),
        # band_key is an md5 hex STRING (functions/hashing.py:128)
        T.StructField("band_key", T.StringType()),
    ]
)
_SHINGLES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("__shingles", T.ArrayType(T.StringType())),
    ]
)


def _read_index(spark, path: str, schema: T.StructType, before_epoch: int) -> DataFrame:
    """Standing-index partitions written by epochs strictly BEFORE
    ``before_epoch`` (partition-pruned scan); empty frame when the index
    does not exist yet (first epoch) or has no earlier partitions.
    Existence is checked through the Hadoop FileSystem API so the index
    can live on HDFS/S3, not only the driver's local disk."""
    if not fsutil.exists(spark, path):
        from lithops_dataframe_spark.operators.util import empty_frame

        return empty_frame(spark, schema)
    with_epoch = T.StructType(
        list(schema.fields) + [T.StructField("epoch", T.IntegerType())]
    )
    loaded = spark.read.schema(with_epoch).parquet(path)
    return loaded.filter(F.col("epoch") < before_epoch).drop("epoch")


def incremental_dedup_batch_step(
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    decisions_dir: str,
    *,
    text_col: str,
    id_col: str,
    shingle_n: int = 2,
    bands: int = 4,
    threshold: float = 0.6,
) -> None:
    """One micro-batch step: probe the standing index, decide keep/drop
    per arriving doc, append the batch to the index. Exposed separately
    from the foreachBatch wiring so tests can drive single steps."""
    spark = batch_df.sparkSession
    from pyspark import StorageLevel

    base = (
        with_minhash(
            ensure_parallelism(batch_df.select(id_col, text_col)),
            text_col,
            shingle_n=shingle_n,
        )
        .select(F.col(id_col).alias("id"), "__shingles", "__sig")
        .persist(StorageLevel.MEMORY_AND_DISK)  # bounded: one micro-batch
    )
    posted = base.select(
        "id", F.explode(H.band_signatures(F.col("__sig"), bands)).alias("band")
    ).select(
        "id",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key"),
    )
    idx_posted = _read_index(spark, f"{index_dir}/postings", _POSTINGS_SCHEMA, epoch_id)

    # probe side: every already-indexed doc can drop an arriving doc; a
    # batch-mate only if it arrived "earlier" (smaller id — deterministic
    # first-wins inside the batch, same rule as the batch operator)
    others = idx_posted.withColumn("require_lt", F.lit(False)).unionByName(
        posted.withColumn("require_lt", F.lit(True))
    )
    a, b = posted.alias("a"), others.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") != F.col("b.id"))
            & (~F.col("b.require_lt") | (F.col("b.id") < F.col("a.id"))),
        )
        .select(F.col("a.id").alias("new_id"), F.col("b.id").alias("other_id"))
        .dropDuplicates(["new_id", "other_id"])
        # byte-small candidates, CPU-bound verify: pin full parallelism
        .repartition(spark.sparkContext.defaultParallelism, "new_id", "other_id")
    )
    sh_all = base.select("id", "__shingles").unionByName(
        _read_index(spark, f"{index_dir}/shingles", _SHINGLES_SCHEMA, epoch_id)
    )
    cand = cand.join(
        sh_all.select(F.col("id").alias("new_id"), F.col("__shingles").alias("sh_a")),
        "new_id",
    ).join(
        sh_all.select(F.col("id").alias("other_id"), F.col("__shingles").alias("sh_b")),
        "other_id",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    matches = cand.filter(inter / union >= threshold).select("new_id")
    n_dup = matches.groupBy("new_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_prior_dups")
    )
    decisions = (
        base.select("id")
        .join(n_dup, F.col("id") == F.col("new_id"), "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce(F.col("n_prior_dups"), F.lit(0).cast("long")).alias(
                "n_prior_dups"
            ),
            F.col("new_id").isNull().cast("int").alias("keep"),
        )
    )
    # Writes keep the upstream task layout: A/B-measured at sf0.1, both
    # coalesce (collapses the probe pipeline: 7.4→8.9 s) and repartition
    # (extra exchanges: →8.4 s) lose to writing as-is. The standing index
    # gets a periodic OPTIMIZE pass instead of per-epoch write reshaping:
    # :func:`compact_index` folds historical epochs into one partition
    # between micro-batches (r9 — see its docstring for the 100 TB
    # listing-bottleneck rationale).
    decisions.write.mode("overwrite").parquet(f"{decisions_dir}/epoch={epoch_id}")
    posted.write.mode("overwrite").parquet(f"{index_dir}/postings/epoch={epoch_id}")
    base.select("id", "__shingles").write.mode("overwrite").parquet(
        f"{index_dir}/shingles/epoch={epoch_id}"
    )
    base.unpersist()


def compact_index(
    spark,
    index_dir: str,
    before_epoch: int,
    *,
    target_partitions: int = 1,
) -> int:
    """Periodic OPTIMIZE pass over the standing LSH index (VERDICT r8
    task 6): fold every ``epoch=<e>`` partition with ``e < before_epoch``
    into ONE consolidated partition, for both the postings and shingles
    sides.

    Why: each micro-batch appends its own epoch partition, so after 10⁴
    epochs the index is 2×10⁴ tiny parquet directories and the
    partition-pruned probe read degrades into a file-listing bottleneck.
    Folding history into a handful of large files restores O(1) listing
    while PRESERVING the probe contract — the consolidated rows land at
    ``epoch = max(folded)``, which stays strictly below every future
    batch's ``epoch < current`` probe predicate, and row content is
    untouched, so decisions after compaction hash-match the uncompacted
    run (tests/test_incremental_dedup.py::test_compaction_preserves_decisions).

    ``target_partitions`` sizes the consolidated write (1 for unit-scale;
    at 100 TB pick index_bytes / file_target). Run it from a maintenance
    trigger BETWEEN micro-batches — same slot where lakehouse engines
    schedule OPTIMIZE. Crash-safety: the consolidated data is fully
    written to a ``_compact_<sub>_epoch<dest>`` staging dir (ignored by
    Spark's partition discovery; the destination epoch is embedded in
    the name) before any old partition is removed, and every call FIRST
    promotes any orphaned staging dir left by a crash between the
    deletes and the rename — so the folded history is recoverable from
    the staging copy at every point in the swap window (code-review r10:
    the previous "re-run the rename" claim had no code behind it). A
    transactional table format (Delta/Iceberg) would make the swap
    atomic — this module deliberately stays on plain parquet like the
    rest of the engine.

    Returns the number of epoch partitions folded away.
    """
    import re

    folded = 0
    for sub, schema in (("postings", _POSTINGS_SCHEMA), ("shingles", _SHINGLES_SCHEMA)):
        path = os.path.join(index_dir, sub)
        # Recovery: promote an orphaned staging dir from a prior crashed
        # swap BEFORE planning this round. The orphan holds the complete
        # fold of every epoch < its cutoff; restoring it to its embedded
        # dest epoch (and dropping any older partial leftovers) recreates
        # the prior attempt's post-compaction state exactly.
        for name in fsutil.list_dir(spark, index_dir):
            m = re.fullmatch(rf"_compact_{sub}_epoch(\d+)", name)
            if not m:
                continue
            dest = int(m.group(1))
            staged = os.path.join(index_dir, name)
            if fsutil.exists(spark, os.path.join(staged, "_SUCCESS")):
                for e in fsutil.list_epochs(spark, path):
                    if e <= dest:
                        fsutil.delete(spark, os.path.join(path, f"epoch={e}"))
                fsutil.rename(spark, staged, os.path.join(path, f"epoch={dest}"))
            else:  # incomplete write — the old partitions are all intact
                fsutil.delete(spark, staged)
        old = [e for e in fsutil.list_epochs(spark, path) if e < before_epoch]
        if len(old) < 2:
            continue  # nothing to fold
        dest = max(old)
        with_epoch = T.StructType(
            list(schema.fields) + [T.StructField("epoch", T.IntegerType())]
        )
        tmp = os.path.join(index_dir, f"_compact_{sub}_epoch{dest}")
        (
            spark.read.schema(with_epoch)
            .parquet(path)
            .filter(F.col("epoch") < before_epoch)
            .drop("epoch")
            .coalesce(target_partitions)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        for e in old:
            fsutil.delete(spark, os.path.join(path, f"epoch={e}"))
        fsutil.rename(spark, tmp, os.path.join(path, f"epoch={dest}"))
        folded += len(old) - 1
    return folded


def foreach_batch_incremental_dedup(
    stream_df: DataFrame,
    index_dir: str,
    decisions_dir: str,
    checkpoint: str,
    *,
    text_col: str,
    id_col: str,
    shingle_n: int = 2,
    bands: int = 4,
    threshold: float = 0.6,
    available_now: bool = True,
    compact_every: int | None = None,
    compact_target_partitions: int = 1,
) -> StreamingQuery:
    """Wire :func:`incremental_dedup_batch_step` into a foreachBatch
    streaming query (availableNow replay by default).

    ``compact_every=N`` runs :func:`compact_index` BEFORE every N-th
    epoch's probe (the between-micro-batches maintenance slot), folding
    all earlier epochs into one partition so the index's directory count
    stays O(N) instead of O(total epochs) — the 100 TB listing-bottleneck
    control. Decisions are unchanged by construction (the compaction test
    hash-matches a compacted vs uncompacted run)."""

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if compact_every and epoch_id > 0 and epoch_id % compact_every == 0:
            compact_index(
                batch_df.sparkSession,
                index_dir,
                before_epoch=int(epoch_id),
                target_partitions=compact_target_partitions,
            )
        incremental_dedup_batch_step(
            batch_df,
            epoch_id,
            index_dir,
            decisions_dir,
            text_col=text_col,
            id_col=id_col,
            shingle_n=shingle_n,
            bands=bands,
            threshold=threshold,
        )

    w = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
