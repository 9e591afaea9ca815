"""Streaming incremental dedup mechanics (round 8).

The oracle sweep gates the end-to-end result; these tests pin the
streaming-specific properties the oracle can't see:

- cross-batch index continuity (a batch-2 doc is dropped because of a
  batch-0 near-dup it never shared a micro-batch with),
- epoch-keyed retry idempotence (re-running a step neither
  double-indexes nor changes decisions),
- equivalence with the BATCH incremental operator when everything
  arrives in one batch.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from lithops_dataframe_spark.operators.dedup import minhash_incremental_dedup
from lithops_dataframe_spark.streaming.dedup import incremental_dedup_batch_step


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


_NEAR_A = "alpha beta gamma delta epsilon zeta eta theta"
_NEAR_A2 = "alpha beta gamma delta epsilon zeta eta iota"  # near-dup of A
_UNIQUE = "completely different words appear in this one only"


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "index"), str(tmp_path / "decisions")


def _run_epochs(spark, batches, index_dir, decisions_dir):
    for epoch, rows in enumerate(batches):
        incremental_dedup_batch_step(
            _docs(spark, rows),
            epoch,
            index_dir,
            decisions_dir,
            text_col="text",
            id_col="doc_id",
        )
    return {
        r["doc_id"]: (r["n_prior_dups"], r["keep"])
        for r in spark.read.parquet(decisions_dir).collect()
    }


def test_cross_batch_index_continuity(spark, dirs):
    index_dir, decisions_dir = dirs
    out = _run_epochs(
        spark,
        [
            [(0, _NEAR_A)],
            [(10, _UNIQUE)],
            [(20, _NEAR_A2)],  # near-dups doc 0 — two epochs earlier
        ],
        index_dir,
        decisions_dir,
    )
    assert out[0] == (0, 1)
    assert out[10] == (0, 1)
    assert out[20] == (1, 0), "batch-2 doc must match the batch-0 index entry"


def test_retry_is_idempotent(spark, dirs):
    index_dir, decisions_dir = dirs
    batches = [[(0, _NEAR_A)], [(20, _NEAR_A2)]]
    out1 = _run_epochs(spark, batches, index_dir, decisions_dir)
    # retry epoch 1 (simulated failure-replay): same decisions, and the
    # index must not have grown (epoch-keyed overwrite, probe < epoch)
    incremental_dedup_batch_step(
        _docs(spark, batches[1]),
        1,
        index_dir,
        decisions_dir,
        text_col="text",
        id_col="doc_id",
    )
    out2 = {
        r["doc_id"]: (r["n_prior_dups"], r["keep"])
        for r in spark.read.parquet(decisions_dir).collect()
    }
    assert out1 == out2 == {0: (0, 1), 20: (1, 0)}
    post = spark.read.parquet(f"{index_dir}/postings")
    assert post.groupBy("id").count().filter("count > 4").count() == 0, (
        "a retried epoch must overwrite its own postings, not append"
    )


def test_single_batch_equals_batch_operator(spark, dirs):
    index_dir, decisions_dir = dirs
    rows = [(0, _NEAR_A), (1, _NEAR_A2), (2, _UNIQUE)]
    out = _run_epochs(spark, [rows], index_dir, decisions_dir)
    batch = {
        r["id"]: (r["n_dup_matches"], r["keep"])
        for r in minhash_incremental_dedup(
            _docs(spark, rows).withColumn("is_new", F.lit(True)),
            "text",
            "doc_id",
            "is_new",
        ).collect()
    }
    assert out == batch == {0: (0, 1), 1: (1, 0), 2: (0, 1)}


def test_compaction_preserves_decisions(spark, dirs, tmp_path):
    """VERDICT r8 task 6: fold epochs < N into one consolidated partition
    mid-stream; later batches must produce decisions that hash-match the
    uncompacted run, and the folded history must really be one partition
    (the 100 TB listing-bottleneck fix at streaming/dedup.py:161-165)."""
    import os

    from lithops_dataframe_spark.streaming.dedup import compact_index

    batches = [
        [(0, _NEAR_A)],
        [(10, _UNIQUE)],
        [(20, _NEAR_A2)],  # near-dups doc 0 (inside the compacted range)
        [(30, _NEAR_A)],   # exact dup of doc 0 — must still match post-fold
    ]
    index_dir, decisions_dir = dirs
    baseline = _run_epochs(spark, batches, index_dir, decisions_dir)

    c_index = str(tmp_path / "c_index")
    c_decisions = str(tmp_path / "c_decisions")
    for epoch, rows in enumerate(batches):
        if epoch == 2:  # maintenance slot between micro-batches
            folded = compact_index(spark, c_index, before_epoch=2)
            assert folded == 2, "both sides must fold epochs {0,1} into one"
        incremental_dedup_batch_step(
            _docs(spark, rows),
            epoch,
            c_index,
            c_decisions,
            text_col="text",
            id_col="doc_id",
        )
    compacted = {
        r["doc_id"]: (r["n_prior_dups"], r["keep"])
        for r in spark.read.parquet(c_decisions).collect()
    }
    assert compacted == baseline
    # physical layout: epochs {0,1} folded into epoch=1; {2,3} appended after
    for sub in ("postings", "shingles"):
        eps = sorted(
            d for d in os.listdir(os.path.join(c_index, sub)) if d.startswith("epoch=")
        )
        assert eps == ["epoch=1", "epoch=2", "epoch=3"], (sub, eps)
    # and a second compaction folds everything below the next batch id
    assert compact_index(spark, c_index, before_epoch=4) == 4
    for sub in ("postings", "shingles"):
        eps = sorted(
            d for d in os.listdir(os.path.join(c_index, sub)) if d.startswith("epoch=")
        )
        assert eps == ["epoch=3"], (sub, eps)


def test_compact_every_wired_into_stream(spark, dirs, tmp_path):
    """compact_every=2 through the REAL foreachBatch wiring: a 4-batch
    availableNow replay must produce the same decisions as the
    step-driven baseline while compaction runs in the maintenance slot
    before epochs 2 (folding {0,1}); the final index holds at most
    compact_every + 1 epoch partitions per side."""
    import os
    import time

    from lithops_dataframe_spark.streaming.dedup import (
        foreach_batch_incremental_dedup,
    )

    batches = [
        [(0, _NEAR_A)],
        [(10, _UNIQUE)],
        [(20, _NEAR_A2)],
        [(30, _NEAR_A)],
    ]
    index_dir, decisions_dir = dirs
    baseline = _run_epochs(spark, batches, index_dir, decisions_dir)

    replay = tmp_path / "replay"
    replay.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        f = str(replay / f"b{i}")
        _docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(f)
        part = [n for n in os.listdir(f) if n.endswith(".parquet")][0]
        dst = str(replay / f"b{i}.parquet")
        os.rename(os.path.join(f, part), dst)
        os.utime(dst, (now - 60 * (len(batches) - i),) * 2)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(replay) + "/*.parquet")
    )
    s_index = str(tmp_path / "s_index")
    s_decisions = str(tmp_path / "s_decisions")
    q = foreach_batch_incremental_dedup(
        stream,
        s_index,
        s_decisions,
        str(tmp_path / "ckpt"),
        text_col="text",
        id_col="doc_id",
        compact_every=2,
    )
    assert q.awaitTermination(300), "stream did not finish"
    streamed = {
        r["doc_id"]: (r["n_prior_dups"], r["keep"])
        for r in spark.read.parquet(s_decisions).collect()
    }
    assert streamed == baseline
    for sub in ("postings", "shingles"):
        eps = sorted(
            d for d in os.listdir(os.path.join(s_index, sub)) if d.startswith("epoch=")
        )
        # epochs {0,1} folded into epoch=1 before epoch 2 ran; 2 and 3 appended
        assert eps == ["epoch=1", "epoch=2", "epoch=3"], (sub, eps)


def test_compaction_crash_recovery(spark, dirs, tmp_path):
    """Crash-window recovery (code-review r10): simulate a driver death
    BETWEEN the old-epoch deletes and the staging rename — the next
    compact_index call must promote the orphaned staging dir first, so
    the folded history is never lost and later decisions still match a
    crash-free run."""
    import os
    import shutil

    from lithops_dataframe_spark.streaming.dedup import compact_index

    batches = [
        [(0, _NEAR_A)],
        [(10, _UNIQUE)],
        [(20, _NEAR_A2)],
        [(30, _NEAR_A)],
    ]
    index_dir, decisions_dir = dirs
    baseline = _run_epochs(spark, batches, index_dir, decisions_dir)

    c_index = str(tmp_path / "c_index")
    c_decisions = str(tmp_path / "c_decisions")
    for epoch, rows in enumerate(batches[:2]):
        incremental_dedup_batch_step(
            _docs(spark, rows), epoch, c_index, c_decisions,
            text_col="text", id_col="doc_id",
        )
    # Crash simulation: replicate compact_index's swap up to (and
    # including) the deletes, but die before the rename — staging dirs
    # complete (_SUCCESS present), epoch dirs already gone.
    from pyspark.sql import types as T

    from lithops_dataframe_spark.streaming.dedup import (
        _POSTINGS_SCHEMA,
        _SHINGLES_SCHEMA,
    )

    for sub, schema in (("postings", _POSTINGS_SCHEMA), ("shingles", _SHINGLES_SCHEMA)):
        path = os.path.join(c_index, sub)
        with_epoch = T.StructType(
            list(schema.fields) + [T.StructField("epoch", T.IntegerType())]
        )
        tmp = os.path.join(c_index, f"_compact_{sub}_epoch1")
        (
            spark.read.schema(with_epoch).parquet(path)
            .filter(F.col("epoch") < 2).drop("epoch")
            .coalesce(1).write.mode("overwrite").parquet(tmp)
        )
        for e in (0, 1):
            shutil.rmtree(os.path.join(path, f"epoch={e}"))
        # <- crash here: no rename
    # Next maintenance slot: recovery inside compact_index. Nothing new
    # to fold afterwards (only the restored epoch=1 is below the cutoff).
    assert compact_index(spark, c_index, before_epoch=2) == 0
    for sub in ("postings", "shingles"):
        eps = sorted(
            d for d in os.listdir(os.path.join(c_index, sub)) if d.startswith("epoch=")
        )
        assert eps == ["epoch=1"], (sub, eps)
        assert not any(
            n.startswith("_compact_") for n in os.listdir(c_index)
        ), "staging dir must be consumed"
    for epoch, rows in list(enumerate(batches))[2:]:
        incremental_dedup_batch_step(
            _docs(spark, rows), epoch, c_index, c_decisions,
            text_col="text", id_col="doc_id",
        )
    recovered = {
        r["doc_id"]: (r["n_prior_dups"], r["keep"])
        for r in spark.read.parquet(c_decisions).collect()
    }
    assert recovered == baseline
