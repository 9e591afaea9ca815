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
