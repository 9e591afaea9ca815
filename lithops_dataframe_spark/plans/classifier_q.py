"""Classifier-training query (operators/classifier.py) with an unrolled
DuckDB replay of every gradient-descent epoch."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.plans.registry import register

_EPOCHS = 6
_LR = 5.0


def _lr_oracle(epochs: int, lr: float) -> str:
    """DuckDB twin of operators/classifier.py::lr_train — same feature
    division chains, same fixed-order margin, same 6-decimal weight
    rounding per epoch, same exp-free accuracy predicate."""
    feats = """
    WITH feats AS MATERIALIZED (
        SELECT doc_id,
               (length(text) > 300)::INT AS y,
               1.0 AS x0,
               length(text) / 1000.0 AS x1,
               (length(text) - length(replace(text, ' ', ''))) / 100.0 AS x2,
               length(regexp_replace(text, '[^0-9]', '', 'g'))
                   / (length(text) + 1.0) AS x3,
               length(text) / ((length(text) - length(replace(text, ' ', ''))) + 1.0)
                   / 10.0 AS x4
        FROM documents
    ),
    n AS MATERIALIZED (SELECT COUNT(*)::DOUBLE AS n FROM feats),
    w0 AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)"""
    sql = feats
    for k in range(epochs):
        z = " + ".join(f"w.w{j} * f.x{j}" for j in range(5))
        grads = ", ".join(
            f"SUM(f.x{j} * (f.y - 1.0 / (1.0 + exp(-({z}))))) AS g{j}" for j in range(5)
        )
        new_w = ", ".join(f"ROUND(w.w{j} + {lr} * g.g{j} / n.n, 6) AS w{j}" for j in range(5))
        zc = " + ".join(f"w.w{j} * f.x{j}" for j in range(5))
        sql += f""",
    g{k} AS MATERIALIZED (
        SELECT {grads} FROM feats f, w{k} w GROUP BY ALL
    ),
    w{k + 1} AS MATERIALIZED (
        SELECT {new_w} FROM w{k} w, g{k} g, n
    ),
    acc{k + 1} AS MATERIALIZED (
        SELECT COUNT(*)::BIGINT AS n_correct
        FROM feats f, w{k + 1} w
        WHERE (({zc}) > 0)::INT = f.y
    )"""
    finals = [
        f"SELECT {k} AS epoch, w.w0, w.w1, w.w2, w.w3, w.w4, a.n_correct "
        f"FROM w{k + 1} w, acc{k + 1} a"
        for k in range(epochs)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(finals)


@register("classifier_lr_train", oracle=_lr_oracle(_EPOCHS, _LR))
def classifier_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression training loop (the quality/language-filter
    training shape): six batch-gradient-descent epochs over text-shape
    features against a separable target, each epoch one combinable
    gradient aggregate + a driver-side k-dim weight update + one exact
    accuracy count — the k-means iterative pattern applied to model
    training. Train accuracy climbs 0.51 → 0.98 across the gated rows
    (see operators/classifier.py for why the target is synthetic-
    separable), and the DuckDB oracle replays every epoch (weights
    rounded to 6 decimals per update, accuracy via the exp-free z>0
    predicate) — the whole trajectory is value-hash-gated, not just the
    final model."""
    from lithops_dataframe_spark.operators.classifier import lr_train

    docs = load_table(spark, sf_dir, "documents")
    return lr_train(docs, epochs=_EPOCHS, lr=_LR)
