"""Concat-and-chunk packing invariants: layout invariance of the global
token offset (the distributed-prefix-sum property), chunk-fill exactness,
and spanning-doc accounting."""

from __future__ import annotations

from lithops_dataframe_spark.plans.traindata_q import _CHUNK_LEN, pack_concat_chunks


def test_layout_invariance(spark, sf_dir):
    from lithops_dataframe_spark.catalog import load_table

    a = sorted(map(tuple, pack_concat_chunks(spark, sf_dir).collect()))

    # same computation, scrambled input layout: rebuild the plan by hand
    # over a repartitioned source
    import lithops_dataframe_spark.plans.traindata_q as tq
    from unittest import mock

    orig = tq.load_table

    def scrambled(spark_, sf, name):
        return orig(spark_, sf, name).repartition(13)

    with mock.patch.object(tq, "load_table", scrambled):
        b = sorted(map(tuple, pack_concat_chunks(spark, sf_dir).collect()))
    assert a == b


def test_fill_and_spanning_exactness(spark, sf_dir):
    rows = {r["chunk_id"]: r for r in pack_concat_chunks(spark, sf_dir).collect()}
    n = len(rows)
    assert set(rows) == set(range(n))  # contiguous chunk ids from 0
    total = sum(r["chunk_tokens"] for r in rows.values())
    for cid, r in rows.items():
        if cid < n - 1:
            assert r["chunk_tokens"] == _CHUNK_LEN  # every non-tail chunk full
        # a chunk can only continue docs that exist
        assert 0 <= r["n_spanning"] <= r["n_docs"]
        assert r["first_doc"] <= r["last_doc"]
    # conservation: chunk fills sum to the corpus token count
    from lithops_dataframe_spark.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    assert total == corpus
