"""Streaming sinks (SURVEY §2.10): the write half of the streaming slice.

- :func:`write_stream_parquet` — the built-in exactly-once file sink:
  checkpointed offsets + a write-ahead file manifest mean a restarted
  query never duplicates or drops a micro-batch.
- :func:`foreach_batch_epoch_sink` — the ``foreachBatch`` escape hatch for
  sinks Spark doesn't ship (JDBC upserts, external indexes…): idempotence
  comes from keying the write by ``epoch_id`` (a retried batch overwrites
  its own directory instead of appending twice) — the standard recipe for
  exactly-once with arbitrary sinks.

Both are verified in tests/test_streaming_sinks.py: replayed events in →
files out → read-back equals the batch input exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet(
    stream_df: DataFrame, path: str, checkpoint: str, *, available_now: bool = True
) -> StreamingQuery:
    """Exactly-once parquet append sink (checkpointed file manifest)."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def foreach_batch_epoch_sink(
    stream_df: DataFrame, path: str, checkpoint: str, *, available_now: bool = True
) -> StreamingQuery:
    """foreachBatch sink with epoch-keyed idempotent writes.

    Each micro-batch lands in ``path/epoch=<id>`` with mode=overwrite:
    a batch retried after a failure rewrites the same directory, so the
    sink holds each input row exactly once regardless of retries.
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    w = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
