"""Custom connector via Spark 4's Python Data Source API (SURVEY §2.1
"sources" extension point).

The reference's only connector is ``read_csv`` over object storage
(reference dataframe/io.py:13-88, byte-range chunks of one CSV). Spark's
native sources cover files; for everything else (REST endpoints, internal
services, bespoke stores) Spark 4 exposes ``pyspark.sql.datasource`` —
register a ``DataSource`` and the engine handles partition planning,
task scheduling, and Arrow transport.

Two sources here:

- :class:`SyntheticDocsDataSource` (format ``lds_docs``): deterministic
  document corpus generated executor-side. Each ``InputPartition`` owns a
  contiguous id range (the 100 TB shape: the *planner* enumerates cheap
  partition descriptors driver-side; each task materializes only its own
  slice — identical contract to a paginated API or a sharded store).
- :class:`BinDirDataSource` (format ``lds_bindir``): reads a directory of
  ``<id>.bin`` payload objects (the media-lake layout written by
  operators/multimodal.py::write_payload_files) with one partition per
  file group — a from-scratch object-lake connector proving the reader
  side of the API against real files.

Both are deterministic, so the registered query carries a full value-hash
oracle (DuckDB replays the synthetic corpus arithmetically / hashes the
same files).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_DOCS_SCHEMA = "doc_id bigint, part int, category string, score double, fingerprint string"


def _doc_row(doc_id: int, part: int) -> tuple:
    """Deterministic row for doc_id — mirrored by the DuckDB oracle."""
    category = f"cat{doc_id % 7}"
    score = (doc_id * 37 % 1000) / 1000.0
    fingerprint = hashlib.md5(str(doc_id).encode()).hexdigest()
    return (doc_id, part, category, score, fingerprint)


class _DocsPartition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index = index
        self.start = start
        self.end = end


class _DocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("n_parts", 8))
        # pushdown state (Spark 4.1 pushFilters): id range + category set
        self.lo = 0
        self.hi = self.n
        self.cats: set[str] | None = None

    def pushFilters(self, filters):
        """Filter pushdown (Spark 4.1): range predicates on ``doc_id``
        tighten the generated id range — PARTITION PRUNING for a synthetic
        / paginated source (fewer partition descriptors planned, less data
        ever materialized); ``category`` equality/IN is consumed row-side
        in :meth:`read`. Anything else is yielded back for Spark to apply.
        A pushed filter must be honored EXACTLY — Spark won't re-check."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("doc_id",) and isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif attr == ("doc_id",) and isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif attr == ("doc_id",) and isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif attr == ("doc_id",) and isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif attr == ("doc_id",) and isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif attr == ("category",) and isinstance(f, EqualTo):
                self.cats = {str(f.value)} if self.cats is None else self.cats & {str(f.value)}
            elif attr == ("category",) and isinstance(f, In):
                vals = {str(v) for v in f.value}
                self.cats = vals if self.cats is None else self.cats & vals
            else:
                yield f  # unsupported: Spark re-applies it

    def partitions(self):
        # planner emits cheap descriptors; data materializes task-side.
        # The (possibly filter-tightened) [lo, hi) range is split here, so
        # pushdown prunes PARTITIONS, not just rows.
        lo, hi = self.lo, max(self.lo, self.hi)
        total = hi - lo
        if total <= 0:
            return [_DocsPartition(0, 0, 0)]
        step = (total + self.n_parts - 1) // self.n_parts
        return [
            _DocsPartition(i, lo + i * step, min(lo + (i + 1) * step, hi))
            for i in range(self.n_parts)
            if lo + i * step < hi
        ]

    def read(self, partition: _DocsPartition):
        for doc_id in range(partition.start, partition.end):
            row = _doc_row(doc_id, partition.index)
            if self.cats is not None and row[2] not in self.cats:
                continue  # consumed category pushdown — exact, not advisory
            yield row


class SyntheticDocsDataSource(DataSource):
    """format("lds_docs").option("n", N).option("n_parts", P)"""

    @classmethod
    def name(cls) -> str:
        return "lds_docs"

    def schema(self) -> str:
        return _DOCS_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _DocsReader(self.options)


_BIN_SCHEMA = "doc_id bigint, n_bytes bigint, payload_md5 string"


class _BinPartition(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class _BinDirReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.n_parts = int(options.get("n_parts", 8))

    def partitions(self):
        files = sorted(f for f in os.listdir(self.path) if f.endswith(".bin"))
        groups = [files[i :: self.n_parts] for i in range(self.n_parts)]
        return [_BinPartition([os.path.join(self.path, f) for f in g]) for g in groups if g]

    def read(self, partition: _BinPartition):
        for fp in partition.files:
            doc_id = int(os.path.basename(fp)[: -len(".bin")])
            with open(fp, "rb") as f:
                data = f.read()
            yield (doc_id, len(data), hashlib.md5(data).hexdigest())


class BinDirDataSource(DataSource):
    """format("lds_bindir").option("path", dir) — object-lake payload reader."""

    @classmethod
    def name(cls) -> str:
        return "lds_bindir"

    def schema(self) -> str:
        return _BIN_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BinDirReader(self.options)


_STREAM_SCHEMA = "seq bigint, user string, amount double"


def _stream_row(seq: int) -> tuple:
    """Deterministic stream record — mirrored by the DuckDB oracle."""
    return (seq, f"u{seq % 10}", (seq * 13 % 100) / 10.0)


class _CounterStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch source: ``read(start)`` advances the
    offset by ``batch_size`` until ``n_total`` records have been emitted;
    ``readBetweenOffsets`` deterministically replays any offset range —
    the exactly-once replay contract a Kafka-like connector implements."""

    def __init__(self, options):
        self.n_total = int(options.get("n_total", 1000))
        self.batch_size = int(options.get("batch_size", 250))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.batch_size, self.n_total)
        return iter([_stream_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter([_stream_row(i) for i in range(int(start["pos"]), int(end["pos"]))])


class CounterStreamDataSource(DataSource):
    """format("lds_counter_stream").option("n_total", N) — bounded
    deterministic micro-batch stream."""

    @classmethod
    def name(cls) -> str:
        return "lds_counter_stream"

    def schema(self) -> str:
        return _STREAM_SCHEMA

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _CounterStreamReader(self.options)


class _PartFileCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class _JsonlDirStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch exactly-once sink: each task writes its partition's
    rows to a uniquely named ``.part`` file and returns a commit message;
    ``commit`` (driver-side, once per epoch) atomically renames the parts
    to ``batch-<id>-*.jsonl`` and records them in a ``_commits`` manifest;
    ``abort`` drops the orphaned parts. Readers that respect the manifest
    see only committed batches — the standard transactional-sink contract
    (same epoch discipline as streaming/sinks.py foreachBatch, expressed
    through the Python Data Source API)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import uuid

        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        tmp = os.path.join(self.path, f".{uuid.uuid4().hex}-p{part}.part")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartFileCommit(tmp, n)

    def commit(self, messages, batch_id) -> None:
        import json

        finals = []
        for i, msg in enumerate(m for m in messages if m is not None):
            final = os.path.join(self.path, f"batch-{batch_id}-{i}.jsonl")
            os.replace(msg.path, final)
            finals.append({"file": os.path.basename(final), "rows": msg.n_rows})
        with open(os.path.join(self.path, "_commits"), "a") as f:
            f.write(json.dumps({"batch": batch_id, "files": finals}) + "\n")

    def abort(self, messages, batch_id) -> None:
        for msg in (m for m in messages if m is not None):
            try:
                os.remove(msg.path)
            except OSError:
                pass


class JsonlDirSinkDataSource(DataSource):
    """writeStream.format("lds_jsonl_sink").option("path", dir)"""

    @classmethod
    def name(cls) -> str:
        return "lds_jsonl_sink"

    def streamWriter(self, schema, overwrite) -> DataSourceStreamWriter:
        return _JsonlDirStreamWriter(self.options)


def register_sources(spark) -> None:
    """Idempotently register all custom formats on the session."""
    # pushFilters() on a Python reader hard-errors unless this (dynamic
    # SQL) conf is on; set here so the external driver's session — whose
    # build we don't control — gets it before any lds_docs scan plans
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(BinDirDataSource)
    spark.dataSource.register(CounterStreamDataSource)
    spark.dataSource.register(JsonlDirSinkDataSource)
