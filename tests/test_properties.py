"""Property-based invariants (SURVEY §5.2.4): results must be independent of
physical partitioning — the distributed-correctness property the reference's
``split_every`` tree-reduction machinery declares (core.py:55-59) and Spark's
exchange-based aggregation must deliver. Each invariant runs a representative
query over the same data at several partition counts and asserts identical
results.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.functions import hashing as H
from lithops_dataframe_spark.operators import dedup as D

from tests.conftest import SF_SMOKE

PARTITIONS = [1, 7, 32]


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("n", PARTITIONS)
def test_sum_invariant_under_repartition(spark, n):
    li = load_table(spark, SF_SMOKE, "lineitem").repartition(n)
    got = li.agg(
        F.round(F.sum("l_extendedprice"), 2).alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_discount"), 9).alias("d"),
    )
    base = load_table(spark, SF_SMOKE, "lineitem").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_discount"), 9).alias("d"),
    )
    assert _rows(got) == _rows(base)


@pytest.mark.parametrize("n", PARTITIONS)
def test_dedup_invariant_under_repartition(spark, n):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    doubled = docs.unionByName(docs).repartition(n)
    got = D.exact_dedup(doubled)
    assert got.count() == docs.count()


@pytest.mark.parametrize("n", PARTITIONS)
def test_minhash_pairs_invariant_under_repartition(spark, n):
    docs = load_table(spark, SF_SMOKE, "documents").repartition(n)
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", shingle_n=2, bands=4, threshold=0.6)
    key = _rows(pairs)
    docs1 = load_table(spark, SF_SMOKE, "documents").coalesce(1)
    base = _rows(D.minhash_lsh_pairs(docs1, "text", "doc_id", shingle_n=2, bands=4, threshold=0.6))
    assert key == base


def test_union_distinct_idempotence(spark):
    # count(distinct) invariant under union with itself (SURVEY §5.2.4)
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    once = orders.distinct().count()
    twice = orders.unionByName(orders).distinct().count()
    assert once == twice


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_pairs_vs_bruteforce(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in D.levenshtein_blocked_pairs(
            docs, "text", "doc_id", prefix_len=16, max_dist=40
        ).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    blocks: dict[str, list] = {}
    for r in rows:
        blocks.setdefault(r["text"][:16], []).append((r["doc_id"], r["text"]))
    exp = {}
    for members in blocks.values():
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                (ia, ta), (ib, tb) = members[x], members[y]
                if ia > ib:
                    ia, ib, ta, tb = ib, ia, tb, ta
                d = _py_levenshtein(ta, tb)
                if d <= 40:
                    exp[(ia, ib)] = d
    assert got == exp and got, f"{len(got)} vs {len(exp)} pairs"


def test_levenshtein_pairs_block_cap(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    # cap 1 → every block is singleton-only → no pairs survive
    capped = D.levenshtein_blocked_pairs(
        docs, "text", "doc_id", prefix_len=16, max_dist=40, max_block_size=1
    )
    assert capped.count() == 0


def test_minhash_signature_stability(spark):
    # signatures are pure functions of text: recomputing under a different
    # plan shape yields byte-identical arrays
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    sig = docs.select("doc_id", H.minhash_signature(H.word_shingles(F.col("text"), 2)).alias("sig"))
    a = {r["doc_id"]: list(r["sig"]) for r in sig.collect()}
    b = {
        r["doc_id"]: list(r["sig"])
        for r in sig.repartition(13).collect()
    }
    assert a == b


def test_pack_sequences_conservation_and_stability(spark):
    """Packing invariants: every document lands in exactly one pack, pack
    token totals conserve the corpus total, and assignments are identical
    under repartitioning (deterministic streams, no RNG)."""
    from lithops_dataframe_spark.plans.traindata_q import pack_training_sequences

    packs = pack_training_sequences(spark, SF_SMOKE)
    rows = packs.collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    total_docs = docs.count()
    total_tokens = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert sum(r.n_docs for r in rows) == total_docs
    assert sum(r.pack_tokens for r in rows) == total_tokens
    again = sorted(tuple(r) for r in pack_training_sequences(spark, SF_SMOKE).collect())
    assert sorted(tuple(r) for r in rows) == again


def test_repetition_metrics_bounded(spark):
    """Every repetition metric is a fraction in [0, 1] and n_kept <= n_docs."""
    from lithops_dataframe_spark.plans.text_q import text_repetition_filter

    for r in text_repetition_filter(spark, SF_SMOKE).collect():
        assert 0 <= r.n_kept <= r.n_docs
        for c in ("avg_distinct_ratio", "avg_top_token_frac", "avg_dup_2gram_frac", "avg_dup_3gram_frac"):
            assert 0.0 <= r[c] <= 1.0, (c, r[c])


def test_int8_quantize_error_bound(spark):
    """Scalar quantization error bound: MSE <= (scale/2)^2 per element
    (round-to-nearest within a 256-level grid can miss by at most scale/2,
    so mean squared error is bounded by scale^2/4)."""
    from lithops_dataframe_spark.plans.similarity_q import emb_int8_quantize

    for r in emb_int8_quantize(spark, SF_SMOKE).collect():
        assert r.mse <= (r.scale / 2) ** 2 + 1e-9, (r.vec_id, r.mse, r.scale)


def test_temperature_weights_normalize(spark):
    """Source weights sum to 1 and keep_rate never exceeds 1."""
    from lithops_dataframe_spark.plans.traindata_q import sample_temperature_weights

    rows = sample_temperature_weights(spark, SF_SMOKE).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-3
    assert all(0.0 < r.keep_rate <= 1.0 for r in rows)


def test_pagerank_invariant_under_shuffle_partitions(spark):
    """Fixed-point PageRank must be EXACTLY partition-invariant: integer
    multiply/div/sum have no summation-order sensitivity, so changing the
    shuffle width cannot move a single rank unit (this is the property
    that licenses the bit-exact DuckDB oracle)."""
    from lithops_dataframe_spark.plans import QUERIES

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = sorted(map(tuple, QUERIES["graph_pagerank"](spark, SF_SMOKE).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = sorted(map(tuple, QUERIES["graph_pagerank"](spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
    # sanity: every rank carries at least the teleport base mass
    assert all(r[1] >= 150_000_000 for r in a)
