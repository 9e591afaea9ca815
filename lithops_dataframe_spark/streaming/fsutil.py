"""Scheme-agnostic directory operations for streaming state/index dirs.

The streaming modules (dedup index, reservoir state, drift decisions,
merge-upsert sink) keep standing state as epoch-keyed parquet
directories. Spark reads/writes those through Hadoop's FileSystem
abstraction, so they work on hdfs:// and s3a:// out of the box — but the
*listing* side (which epoch is newest? is the target initialized?) used
driver-local ``os.listdir``, silently restricting state recovery to the
driver's local filesystem (ADVICE r9). These helpers route the listing
through the same Hadoop FileSystem API Spark itself uses (precedent:
``sources/csv.py:_snoop_head``), so ``file:``, ``hdfs:``, ``s3a:``,
``gs:`` and ``abfss:`` all behave identically.

Driver-side cost is one NameNode/object-store LIST per call — O(children
of one directory), never a recursive walk; the compaction path exists
precisely to keep that child count bounded.
"""

from __future__ import annotations

import re

_EPOCH_RE = re.compile(r"epoch=(\d+)")


def _fs_path(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def exists(spark, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def list_dir(spark, path: str) -> list[str]:
    """Child names (not full paths) of ``path``; [] if it doesn't exist."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def list_epochs(spark, path: str) -> list[int]:
    """Sorted epoch numbers of the ``epoch=N`` children of ``path``."""
    return sorted(
        int(m.group(1))
        for n in list_dir(spark, path)
        if (m := _EPOCH_RE.fullmatch(n))
    )


def delete(spark, path: str) -> None:
    """Recursive delete; no-op if absent."""
    fs, p = _fs_path(spark, path)
    fs.delete(p, True)


def rename(spark, src: str, dst: str) -> None:
    fs, p = _fs_path(spark, src)
    _, q = _fs_path(spark, dst)
    if not fs.rename(p, q):
        raise OSError(f"rename failed: {src} -> {dst}")
