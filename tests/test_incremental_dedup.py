"""Invariants for the round-6 production-pattern operators:
incremental batch dedup and trained-classifier corpus scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.operators import dedup as D

_SF = "/root/testdata/sf0.001"


def test_incremental_decisions_match_full_pair_mining(spark):
    """The incremental decision must be DERIVABLE from the full pair set:
    an arriving doc is dropped iff minhash_lsh_pairs (same parameters,
    whole corpus) contains a qualifying pair — one linking it to an
    existing doc or to a smaller-id arriving doc. This pins the
    incremental probe join to the semantics of the batch operator it
    replaces (same signatures, same bands, same verification)."""
    docs = load_table(spark, _SF, "documents").withColumn(
        "is_new", F.col("doc_id") % 10 == 0
    )
    inc = {
        r["id"]: (r["n_dup_matches"], r["keep"])
        for r in D.minhash_incremental_dedup(
            docs, "text", "doc_id", "is_new", shingle_n=2, bands=4, threshold=0.6
        ).collect()
    }
    pairs = D.minhash_lsh_pairs(
        docs, "text", "doc_id", shingle_n=2, bands=4, threshold=0.6
    ).collect()
    new = {r for r in inc}
    expected_matches: dict[int, int] = {d: 0 for d in new}
    for r in pairs:
        a, b = r["id_a"], r["id_b"]  # a < b by contract
        # qualifying threats, matching the operator's first-wins rule
        if b in new and (a not in new or a < b):
            expected_matches[b] += 1
        if a in new and b not in new:
            expected_matches[a] += 1
    assert set(inc) == set(expected_matches)
    for d, (n, keep) in inc.items():
        assert n == expected_matches[d], f"doc {d}: {n} != {expected_matches[d]}"
        assert keep == (1 if n == 0 else 0)
    # the fixture must exercise both outcomes or this test gates nothing
    keeps = {keep for _, keep in inc.values()}
    assert keeps == {0, 1}, f"vacuous fixture: only keep={keeps}"


def test_score_frame_totals_match_training_accuracy(spark):
    """Scoring the corpus under the FINAL trained weights must reproduce
    the trainer's own last-epoch n_correct exactly: tp + tn == n_correct
    (same exp-free z>0 predicate, same features, same weights)."""
    from lithops_dataframe_spark.operators.classifier import lr_train, score_frame

    docs = load_table(spark, _SF, "documents")
    traj = lr_train(docs, epochs=3, lr=5.0).collect()
    last = max(traj, key=lambda r: r["epoch"])
    w = [float(last[f"w{j}"]) for j in range(5)]
    scored = score_frame(docs, w)
    agg = scored.agg(
        F.sum((F.col("pred") == F.col("y")).cast("long")).alias("correct"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg["correct"] == last["n_correct"]
    assert agg["n"] == docs.count()
