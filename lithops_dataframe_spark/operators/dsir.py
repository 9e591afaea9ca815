"""DSIR-style importance-weighted training-data selection (SURVEY §2.11).

Reference context: the reference (cloudbutton/lithops-dataframe) has no
data-selection surface at all — this module supplies the hashed-n-gram
importance-resampling recipe (public: Xie et al., "Data Selection for
Language Models via Importance Resampling", arXiv:2302.03169) that a
100 TB pretraining pipeline runs to up-weight target-like documents,
re-expressed Spark-first:

1. **Fit** two hashed-unigram multinomial models over a FIXED B-bucket
   feature space — one on the TARGET slice (the distribution you want
   more of), one on the RAW corpus. One explode → hash → groupBy
   aggregate; map-side combine means the shuffle carries at most B rows
   per task regardless of corpus size.
2. **Weights** are the per-bucket smoothed log-likelihood ratios,
   quantized to integer MICRO-units (``CAST(ROUND(llr·1e6) AS BIGINT)``
   — the fixed-point BIGINT discipline of graph_pagerank). B integers =
   model-sized driver state (the LR-weights / k-means-centroid pattern),
   re-broadcast into the plan as an array literal.
3. **Score + select**: every document folds its own token array through
   the broadcast weight array with a JVM-side ``aggregate`` HOF — a
   zero-shuffle narrow scan — and the top-K survivors come back via
   ``orderBy().limit()`` (TakeOrderedAndProject: per-partition heaps, no
   global sort).

Cross-engine determinism: the per-doc score is an EXACT integer sum of
quantized weights, so it replays bit-identically in DuckDB regardless of
token order; the only float step (one ln ratio per bucket, ≤ B values)
is rounded at quantization exactly like the classifier's per-epoch
6-decimal weight rounding. Count→double conversions stay exact while
total token counts < 2^53 (~9e15 tokens — comfortably past 100 TB of
text only if bucket counts are sharded; at that point widen MICRO math
to DECIMAL, noted in SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lithops_dataframe_spark.functions import hashing as H
from lithops_dataframe_spark.functions import text as T

#: Hashed feature dimensionality (buckets) — fixed, vocabulary-free.
B_BUCKETS = 256

#: Fixed-point scale for log-likelihood-ratio weights.
MICRO = 1_000_000


def _bucket(token: Column) -> Column:
    return H.token_hash(token) % B_BUCKETS


def bucket_weights(docs: DataFrame, is_target: Column) -> list[int]:
    """Fit the two hashed-unigram models and return the quantized
    log-ratio weight table as a dense Python list of ``B_BUCKETS`` ints
    (unseen buckets weigh 0; every *scorable* bucket is seen by
    construction, because the raw model is fit on the same corpus that
    is scored).

    ONE aggregate job: the per-bucket (target_count, raw_count) pairs —
    ≤ B_BUCKETS rows — plus their totals, then the ln-ratio quantization
    happens in-engine (same `ln` on the same doubles as the DuckDB twin)
    and only exact BIGINTs cross to the driver.
    """
    tok = docs.select(
        is_target.cast("long").alias("is_t"),
        F.explode(T.ws_tokens(F.col("text"))).alias("token"),
    )
    cnt = (
        tok.select("is_t", _bucket(F.col("token")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.sum("is_t").alias("ct"), F.count(F.lit(1)).alias("cr"))
        .persist()
    )
    tot = cnt.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr")).collect()[0]
    ttb = float(tot["tt"]) + float(B_BUCKETS)
    trb = float(tot["tr"]) + float(B_BUCKETS)
    rows = cnt.select(
        "bucket",
        F.round(
            (
                F.log((F.col("ct") + F.lit(1.0)) / F.lit(ttb))
                - F.log((F.col("cr") + F.lit(1.0)) / F.lit(trb))
            )
            * F.lit(float(MICRO)),
            0,
        )
        .cast("long")
        .alias("wq"),
    ).collect()
    cnt.unpersist()
    weights = [0] * B_BUCKETS
    for r in rows:
        weights[int(r["bucket"])] = int(r["wq"])
    return weights


def dsir_select(docs: DataFrame, is_target: Column, *, k: int) -> DataFrame:
    """Score every document by the exact integer log-ratio sum of its
    hashed tokens under the fitted weights and return the top-``k``
    target-like rows: (doc_id, n_toks, score_micro), ordered
    deterministically by (score DESC, doc_id)."""
    weights = bucket_weights(docs, is_target)
    warr = F.array(*[F.lit(int(v)).cast("long") for v in weights])
    toks = T.ws_tokens(F.col("text"))
    score = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.element_at(warr, (_bucket(t) + 1).cast("int")),
    )
    # A NULL-text document has no token bag to score: its NULL score row
    # would still survive orderBy+limit on the Spark side while the
    # oracle's token unnest never produces it (r10 edge row) — excluded
    # by contract, same as the model-fitting side where explode/unnest
    # drop the row on both engines.
    return (
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_toks"),
            score.alias("score_micro"),
        )
        # n_toks in the ordering: duplicate doc_ids are distinct documents
        # scored separately (r11), so the top-k cut needs a tiebreak past
        # doc_id when scores collide at the boundary
        .orderBy(
            F.col("score_micro").desc(), F.col("doc_id").asc(), F.col("n_toks").asc()
        )
        .limit(k)
    )
