"""Distributed classifier training: logistic regression by batch gradient
descent — the quality/language-filter training loop of an LLM data
pipeline, in the k-means iterative shape.

Each iteration is ONE map-side-combinable aggregate over the feature
frame (per-weight gradient sums + example count) followed by a
driver-side update of the k-dimensional weight vector (legitimately
driver-sized — the k-means-centroid pattern); a second single-scan
aggregate scores training accuracy under the updated weights. At 100 TB
that is two scans per epoch with combiner pre-aggregation and nothing
else — exactly how large-scale batch LR trains.

Cross-engine determinism (so DuckDB replays every epoch bit-for-bit):
features derive from integer counts through a FIXED chain of IEEE
divisions; the margin z = w·x is summed in fixed expression order;
weights round to 6 decimals after every update (absorbing the sub-ulp
drift of summing per-row gradients in different orders — the only
nondeterministic float source, since exp() may differ by 1 ulp between
libm implementations); and accuracy uses the exp-free predicate z > 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (name, Spark Column builder) — the DuckDB twins live in plans/classifier_q.py
N_FEATURES = 5  # bias + 4 shape features


def feature_frame(docs: DataFrame, *, keep: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, y, x0..x4): bias plus text-shape features from integer
    counts via fixed division chains — bit-identical across engines.

    The target is ``length(text) > 300`` — a SEPARABLE label (balanced
    ~51/49 on the fixture) chosen so the gated trajectory demonstrates
    the loop actually LEARNING (0.51 → 0.98 train accuracy over six
    epochs), not just iterating: the fixture's synthetic text has
    identical shape statistics across its lang/source columns, so a
    "real" label would plateau at the class prior and gate nothing but
    arithmetic. Swap the label column and features for a production
    quality/language filter — the loop is unchanged."""
    text = F.col("text")
    n_chars = F.length(text).cast("double")
    spaces = (F.length(text) - F.length(F.regexp_replace(text, " ", ""))).cast("double")
    digits = F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double")
    # NULL text has no label and no features: the row would ride through
    # training as all-NULL (harmlessly skipped by the gradient sums but
    # COUNTED in n) and then rank nondeterministically in downstream
    # calibration/AUC ordering (r10 edge row) — excluded by contract on
    # both engines (oracle CTEs carry the same WHERE).
    docs = docs.filter(text.isNotNull())
    return docs.select(
        *keep,
        "doc_id",
        (F.length(text) > 300).cast("int").alias("y"),
        F.lit(1.0).alias("x0"),
        (n_chars / F.lit(1000.0)).alias("x1"),
        (spaces / F.lit(100.0)).alias("x2"),
        (digits / (n_chars + F.lit(1.0))).alias("x3"),
        (n_chars / (spaces + F.lit(1.0)) / F.lit(10.0)).alias("x4"),
    )


def score_frame(
    docs: DataFrame, weights: list[float], *, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Corpus-wide INFERENCE under trained weights — the apply half of the
    train→filter loop. The weight vector rides along as plain literals
    (the k-dim broadcast that model serving is at any scale: the corpus
    scan is embarrassingly parallel, no shuffle, no Python), and the
    decision uses the same exp-free ``z > 0`` predicate as training
    accuracy, so it replays exactly in any engine. Adds ``pred`` (0/1)
    to the feature frame."""
    feats = feature_frame(docs, keep=keep)
    return score_features(feats, weights)


def score_features(feats: DataFrame, weights: list[float]) -> DataFrame:
    """Inference over an already-featurized frame (``x0..x{k-1}``) —
    same exp-free ``z > 0`` predicate as :func:`score_frame`, for
    callers that hold a cached feature frame (k-fold CV)."""
    z = F.lit(weights[0]) * F.col("x0")
    for j in range(1, N_FEATURES):
        z = z + F.lit(weights[j]) * F.col(f"x{j}")
    return feats.withColumn("pred", (z > 0).cast("int"))


def lr_train(
    docs: DataFrame,
    *,
    epochs: int = 6,
    lr: float = 5.0,
) -> DataFrame:
    """Train and return the trajectory: one row per epoch with the updated
    (rounded) weights and the exact training-correct count under them."""
    return lr_train_features(
        feature_frame(docs).localCheckpoint(eager=True), epochs=epochs, lr=lr
    )


def lr_train_features(
    feats: DataFrame,
    *,
    epochs: int = 6,
    lr: float = 5.0,
    n: int | None = None,
) -> DataFrame:
    """Train on an ALREADY-FEATURIZED (and ideally already-materialized)
    frame with columns ``y, x0..x{k-1}`` — the hook that lets k-fold CV
    featurize the corpus once and run every fold's epochs against the
    same cached frame instead of re-paying the regex-heavy featurize
    pass per fold (r7; the caller owns materialization). ``n`` lets a
    caller that already knows the row count (k-fold's per-fold sizes
    come from one groupBy) skip the count job.

    r12 action fusion (guide §1.2 — don't pay two scans where one
    suffices): each epoch's exact train-correct count under the UPDATED
    weights is computed in the SAME aggregate as the NEXT epoch's
    gradient, so the loop runs ``epochs + 1`` jobs instead of
    ``2 × epochs``. Every expression (gradient sums, HALF_UP 6-decimal
    weight rounding, the exp-free correctness predicate) is unchanged,
    so the trajectory stays bit-identical to the unrolled oracle."""
    spark = feats.sparkSession
    if n is None:
        n = feats.count()
    w = [0.0] * N_FEATURES

    def margin(weights):
        z = F.lit(weights[0]) * F.col("x0")
        for j in range(1, N_FEATURES):
            z = z + F.lit(weights[j]) * F.col(f"x{j}")
        return z

    def grad_exprs(weights):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin(weights)))
        return [
            F.sum(F.col(f"x{j}") * (F.col("y") - p)).alias(f"g{j}")
            for j in range(N_FEATURES)
        ]

    def correct_expr(weights):
        # ≡ filter((margin > 0)::int == y).count(): TRUE → 1, FALSE → 0,
        # NULL comparison → NULL which sum skips exactly like filter drops
        return F.coalesce(
            F.sum(((margin(weights) > 0).cast("int") == F.col("y")).cast("long")),
            F.lit(0).cast("long"),
        ).alias("__nc")

    def update(weights, grad_row):
        # weight update rounded IN-ENGINE: Spark F.round (HALF_UP) matches
        # DuckDB ROUND; Python's round() is banker's and can diverge on
        # representable 6-decimal ties, compounding through later epochs
        upd = (
            spark.range(1)
            .select(
                *[
                    F.round(
                        F.lit(weights[j])
                        + F.lit(lr) * F.lit(grad_row[f"g{j}"]) / F.lit(float(n)),
                        6,
                    ).alias(f"w{j}")
                    for j in range(N_FEATURES)
                ]
            )
            .collect()[0]
        )
        return [float(upd[f"w{j}"]) for j in range(N_FEATURES)]

    rows = []
    grad_row = feats.agg(*grad_exprs(w)).collect()[0]
    for epoch in range(epochs):
        w = update(w, grad_row)
        if epoch + 1 < epochs:
            fused = feats.agg(*grad_exprs(w), correct_expr(w)).collect()[0]
            grad_row, n_correct = fused, fused["__nc"]
        else:
            n_correct = feats.agg(correct_expr(w)).collect()[0]["__nc"]
        rows.append((epoch, *w, int(n_correct)))

    schema = (
        "epoch int, "
        + ", ".join(f"w{j} double" for j in range(N_FEATURES))
        + ", n_correct bigint"
    )
    from lithops_dataframe_spark.operators.util import values_frame

    return values_frame(spark, rows, schema)
