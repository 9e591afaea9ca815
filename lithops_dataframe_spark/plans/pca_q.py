"""PCA power-iteration query (operators/pca.py) with an unrolled DuckDB
replay of every iteration."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.operators import similarity as S
from lithops_dataframe_spark.plans.registry import register

_ITERS = 5
_DIM = 64


def _pca_oracle(iters: int, dim: int) -> str:
    d1 = dim + 1
    fold = "(a, b) -> a + b"
    sql = f"""
    WITH x AS MATERIALIZED (SELECT embedding::DOUBLE[] AS x FROM embeddings),
    mud AS MATERIALIZED (
        SELECT j, ROUND(AVG(x[j]), 6) AS m
        FROM x, UNNEST(range(1, {d1})) AS t(j)
        GROUP BY j
    ),
    muv AS MATERIALIZED (SELECT list(m ORDER BY j) AS mu FROM mud),
    cx AS MATERIALIZED (
        SELECT list_transform(range(1, {d1}), j -> x[j] - m.mu[j]) AS c
        FROM x, muv m
    ),
    totss AS MATERIALIZED (
        SELECT ROUND(SUM(list_reduce(list_transform(c, y -> y * y), {fold})), 4) AS t
        FROM cx
    ),
    v0 AS MATERIALIZED (SELECT list_transform(range(1, {d1}), j -> 0.125) AS v)"""
    for k in range(iters):
        sql += f""",
    cd{k} AS MATERIALIZED (
        SELECT c,
               list_reduce(list_transform(range(1, {d1}), j -> c[j] * v.v[j]), {fold}) AS d
        FROM cx, v{k} v
    ),
    wd{k} AS MATERIALIZED (
        SELECT j, ROUND(SUM(c[j] * d), 6) AS w
        FROM cd{k}, UNNEST(range(1, {d1})) AS t(j)
        GROUP BY j
    ),
    wl{k} AS MATERIALIZED (SELECT list(w ORDER BY j) AS w FROM wd{k}),
    lam{k} AS MATERIALIZED (
        SELECT ROUND(sqrt(list_reduce(list_transform(w, y -> y * y), {fold})), 6) AS lam
        FROM wl{k}
    ),
    v{k + 1} AS MATERIALIZED (
        SELECT list_transform(w.w, y -> ROUND(y / l.lam, 6)) AS v
        FROM wl{k} w, lam{k} l
    ),
    d2{k} AS MATERIALIZED (SELECT ROUND(SUM(d * d), 4) AS s FROM cd{k})"""
    # v serialized as comma-joined micro-units: components are rounded to
    # 6 dp in-engine, so ×1e6 rounds to an exact BIGINT in both engines
    # (top-level list columns can't survive pandas canonicalization).
    v_ser = (
        "array_to_string(list_transform(v.v, "
        "y -> CAST(CAST(ROUND(y * 1000000) AS BIGINT) AS VARCHAR)), ',')"
    )
    finals = [
        f"SELECT {k} AS iter, l.lam, ROUND(d.s / t.t, 6) AS var_explained, "
        f"{v_ser} AS v_micro "
        f"FROM lam{k} l, d2{k} d, totss t, v{k + 1} v"
        for k in range(iters)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(finals)


@register("emb_pca_power_iteration", oracle=S.finite_emb_oracle(_pca_oracle(_ITERS, _DIM)))
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding cloud by distributed power
    iteration: per iteration ONE scan computes centered dots and the
    (dim)-keyed accumulation w = Σ (x-μ)(x-μ)·v — no dim×dim covariance
    matrix ever materializes, so the same plan runs at any corpus size
    (the ANN-preprocessing/whitening step). The trajectory row per
    iteration carries λ (the growing eigenvalue estimate), the variance
    explained by the current direction, and the full 64-dim direction
    vector serialized to comma-joined micro-units (scalar column — the
    result canonicalizer can't hash list cells); the DuckDB oracle
    replays every iteration with identical
    fold order and in-engine rounding, so all of it value-hashes."""
    from lithops_dataframe_spark.operators.pca import pca_power_iteration

    embs = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    return pca_power_iteration(embs, "embedding", iterations=_ITERS, dim=_DIM)
