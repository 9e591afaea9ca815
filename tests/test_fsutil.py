"""streaming/fsutil: Hadoop-FS-backed listing used by standing streaming
state (reservoir snapshots, dedup index, merge-upsert sink init check) —
must behave identically on plain local paths and file:// URIs, so the
same code path serves hdfs://s3a:// in production (ADVICE r9: the old
os.listdir listing silently required driver-local state)."""

from __future__ import annotations

import os

from lithops_dataframe_spark.streaming import fsutil


def test_list_epochs_and_exists(spark, tmp_path):
    root = str(tmp_path / "state")
    assert not fsutil.exists(spark, root)
    assert fsutil.list_epochs(spark, root) == []
    for e in (0, 2, 10):
        os.makedirs(os.path.join(root, f"epoch={e}"))
    os.makedirs(os.path.join(root, "not_an_epoch"))
    assert fsutil.exists(spark, root)
    assert fsutil.list_epochs(spark, root) == [0, 2, 10]
    assert sorted(fsutil.list_dir(spark, root)) == [
        "epoch=0", "epoch=10", "epoch=2", "not_an_epoch",
    ]


def test_file_uri_scheme(spark, tmp_path):
    """The same calls through an explicit file:// URI — the scheme path a
    cluster deployment exercises with hdfs:///s3a://."""
    root = str(tmp_path / "s")
    os.makedirs(os.path.join(root, "epoch=3"))
    assert fsutil.list_epochs(spark, "file://" + root) == [3]


def test_delete_and_rename(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    os.makedirs(os.path.join(a, "epoch=1"))
    fsutil.rename(spark, a, b)
    assert not os.path.exists(a)
    assert fsutil.list_epochs(spark, b) == [1]
    fsutil.delete(spark, b)
    assert not os.path.exists(b)
    fsutil.delete(spark, b)  # idempotent on absent path
