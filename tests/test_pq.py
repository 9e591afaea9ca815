"""PQ quality invariants beyond the oracle: codes live in range and the
trained codebooks beat the trivial k=1 (global-mean) quantizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from lithops_dataframe_spark.plans.pq_q import _K, _M, emb_pq_encode

from tests.conftest import SF_SMOKE


def test_pq_codes_and_reconstruction_quality(spark):
    enc = emb_pq_encode(spark, SF_SMOKE).persist()
    rows = enc.collect()
    assert rows, "no vectors encoded"
    for r in rows:
        for m in range(_M):
            assert 0 <= r[f"code{m}"] < _K
        assert r["recon_mse"] >= 0.0

    # k=8 codebooks must reconstruct better than quantizing every vector
    # to the global mean (the k=1 baseline): avg per-dim MSE < variance
    from lithops_dataframe_spark.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    comp = emb.select(F.explode("embedding").alias("v")).agg(
        F.var_pop(F.col("v").cast("double")).alias("var")
    ).collect()[0]
    pq_mse = enc.agg(F.avg("recon_mse")).collect()[0][0]
    assert pq_mse < comp["var"], (pq_mse, comp["var"])
    enc.unpersist()
