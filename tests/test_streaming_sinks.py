"""Streaming sink round-trips: replayed events stream → sink files →
read-back must equal the batch input exactly (exactly-once contract of
the checkpointed file sink and the epoch-keyed foreachBatch sink)."""

from __future__ import annotations

import shutil

import pytest

from lithops_dataframe_spark.catalog import normalize_events_ts
from lithops_dataframe_spark.streaming import events as SE
from lithops_dataframe_spark.streaming.sinks import (
    foreach_batch_epoch_sink,
    write_stream_parquet,
)

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def replay_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_sink_replay")
    src = f"{SF_SMOKE}/events.parquet"
    shutil.copy(src, d / "part-0000.parquet")
    shutil.copy(src, d / "part-0001.parquet")
    return str(d)


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_parquet_file_sink_roundtrip(spark, replay_dir, tmp_path):
    raw = spark.read.parquet(replay_dir)
    stream = normalize_events_ts(SE.read_events_stream(spark, replay_dir, raw.schema))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = write_stream_parquet(stream, out, ckpt)
    assert q.awaitTermination(300)
    assert _rows(spark.read.parquet(out)) == _rows(normalize_events_ts(raw))


def test_foreach_batch_epoch_sink_roundtrip(spark, replay_dir, tmp_path):
    raw = spark.read.parquet(replay_dir)
    stream = normalize_events_ts(SE.read_events_stream(spark, replay_dir, raw.schema))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = foreach_batch_epoch_sink(stream, out, ckpt)
    assert q.awaitTermination(300)
    back = spark.read.option("basePath", out).parquet(out + "/epoch=*").drop("epoch")
    assert _rows(back) == _rows(normalize_events_ts(raw))


def test_checkpoint_restart_incremental(spark, tmp_path):
    """Exactly-once across RESTARTS: a second query started on the SAME
    checkpoint after new files landed processes only the new files — the
    output holds every input row exactly once (no reprocessing, no gaps).
    This is the nightly-incremental production pattern: availableNow runs
    to completion, terminates, and the next run resumes from the offsets
    the checkpoint recorded."""
    import time

    src = f"{SF_SMOKE}/events.parquet"
    in_dir, out, ckpt = tmp_path / "in", str(tmp_path / "out"), str(tmp_path / "ckpt")
    in_dir.mkdir()

    shutil.copy(src, in_dir / "b0.parquet")
    schema = spark.read.parquet(str(in_dir)).schema
    stream = normalize_events_ts(SE.read_events_stream(spark, str(in_dir), schema))
    assert write_stream_parquet(stream, out, ckpt).awaitTermination(300)
    n_first = spark.read.parquet(out).count()

    time.sleep(1.2)
    shutil.copy(src, in_dir / "b1.parquet")  # new data lands between runs
    stream2 = normalize_events_ts(SE.read_events_stream(spark, str(in_dir), schema))
    assert write_stream_parquet(stream2, out, ckpt).awaitTermination(300)

    back = spark.read.parquet(out)
    expected = normalize_events_ts(spark.read.parquet(str(in_dir)))
    assert back.count() == 2 * n_first  # each file exactly once
    assert _rows(back) == _rows(expected)
