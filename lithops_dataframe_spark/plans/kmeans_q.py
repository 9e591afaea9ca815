"""K-means query: fixed-iteration Lloyd's over the embeddings fixture,
checked against a DuckDB oracle that replays the SAME iterations as
chained CTEs (init = lowest-id vectors; centroids rounded to 6 decimals
each update on both engines, so assignment distances derive from
bit-identical centroid values; argmin ties break on cell id)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.operators.clustering import kmeans_fit
from lithops_dataframe_spark.operators import similarity as S
from lithops_dataframe_spark.plans.registry import register

_K = 8
_ITERS = 3
_DIM = 64


def replay_ctes(
    k: int, iters: int, dim: int, prefix: str = "", off: int = 0
) -> tuple[list[str], str]:
    """CTE fragments that replay ``kmeans_fit(k, iters)`` over the
    ``embeddings`` view; returns (parts, final_centroid_cte) where the final
    CTE has columns (cell, pos, m) — the trained centroid matrix. Shared by
    the kmeans_cells oracle, the trained-quantizer IVF oracle
    (plans/similarity_q.py), and — via ``off``/``dim`` slicing — the
    per-subspace product-quantization oracles (plans/pq_q.py), so every
    gate replays identical arithmetic. ``off`` is the 0-based start of the
    embedding slice the training ran on."""
    p = prefix
    parts = [
        f"""{p}c0 AS (
        SELECT vec_id AS cell, t.i - 1 AS pos, ROUND(embedding[{off} + t.i]::DOUBLE, 6) AS m
        FROM embeddings, range(1, {dim + 1}) t(i)
        WHERE vec_id < {k}
    )"""
    ]
    prev = f"{p}c0"
    for it in range(1, iters + 1):
        parts.append(f"""{p}a{it} AS (
        SELECT e.vec_id AS id, cr.cell,
               SUM((e.embedding[cr.pos + 1 + {off}]::DOUBLE - cr.m) * (e.embedding[cr.pos + 1 + {off}]::DOUBLE - cr.m)) AS d2
        FROM embeddings e JOIN {prev} cr ON true
        GROUP BY e.vec_id, cr.cell
    )""")
        parts.append(f"""{p}s{it} AS (
        SELECT id, cell FROM (
            SELECT id, cell, row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rk FROM {p}a{it}
        ) WHERE rk = 1
    )""")
        parts.append(f"""{p}u{it} AS (
        SELECT s.cell, t.i - 1 AS pos, ROUND(AVG(e.embedding[{off} + t.i]::DOUBLE), 6) AS m
        FROM {p}s{it} s JOIN embeddings e ON e.vec_id = s.id, range(1, {dim + 1}) t(i)
        GROUP BY s.cell, t.i
    )""")
        # cells that lost every member keep their previous centroid
        parts.append(f"""{p}c{it} AS (
        SELECT p.cell, p.pos, COALESCE(n.m, p.m) AS m
        FROM {prev} p LEFT JOIN {p}u{it} n ON n.cell = p.cell AND n.pos = p.pos
    )""")
        prev = f"{p}c{it}"
    return parts, prev


def _oracle() -> str:
    parts, prev = replay_ctes(_K, _ITERS, _DIM)
    final = f"""af AS (
        SELECT e.vec_id AS id, cr.cell,
               SUM((e.embedding[cr.pos + 1]::DOUBLE - cr.m) * (e.embedding[cr.pos + 1]::DOUBLE - cr.m)) AS d2
        FROM embeddings e JOIN {prev} cr ON true
        GROUP BY e.vec_id, cr.cell
    )"""
    parts.append(final)
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    SELECT id, cell::INT AS cell, ROUND(d2, 6) AS dist2 FROM (
        SELECT id, cell, d2, row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rk FROM af
    ) WHERE rk = 1
    """
    )


@register("kmeans_cells", oracle=S.finite_emb_oracle(_oracle()))
def kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    _, assigned = kmeans_fit(emb, k=_K, iterations=_ITERS)
    return assigned.select("id", "cell", "dist2")
