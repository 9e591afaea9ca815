"""Retrieval & warehouse-maintenance queries:

- ``text_bm25_search``: full-text retrieval with BM25 over an inverted
  index built from the corpus — the relevance-scoring pass a training-data
  curation pipeline runs to mine documents for a topic. Posting-list
  retrieval shape: query terms join the (doc, term, tf) index, so only
  documents containing at least one query term are touched.
- ``scd2_customer_dim``: slowly-changing-dimension type 2 maintenance —
  apply a staged update set to a dimension table producing versioned rows
  (close the old validity interval, open the new) — the standard
  warehouse upsert expressed as pure relational ops (no MERGE needed).

Both carry full value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.operators.util import ensure_parallelism, values_frame
from lithops_dataframe_spark.operators import similarity as S
from lithops_dataframe_spark.plans.registry import register

# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------
_K1 = 1.2
_B = 0.75
_TOPK = 5
# query terms drawn from the fixture vocabulary (FIXTURES.md word salad)
_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["table", "scan"]),
    (2, ["hash", "join", "merge"]),
    (3, ["window", "sort"]),
    (4, ["spark", "batch"]),
]

_Q_SQL = " UNION ALL ".join(
    f"SELECT {qid} AS query_id, '{t}' AS token" for qid, terms in _QUERIES for t in terms
)

_BM25_CTES = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    q AS ({_Q_SQL}),
    hits AS (
        SELECT q.query_id, tf.doc_id,
               ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * ({_K1} + 1))
               / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl)) AS term_score
        FROM q
        JOIN tf ON tf.token = q.token
        JOIN dl ON dl.doc_id = tf.doc_id
        JOIN dfreq ON dfreq.token = q.token
        CROSS JOIN stats
    ),
    scored AS (
        SELECT query_id, doc_id, ROUND(SUM(term_score), 6) AS score
        FROM hits GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM scored
    )"""

_BM25_ORACLE = f"""
    {_BM25_CTES}
    SELECT query_id, doc_id, score, rank::INT AS rank
    FROM ranked WHERE rank <= {_TOPK}
"""


def _bm25_ranked(spark: SparkSession, docs: DataFrame, topk: int) -> DataFrame:
    """Shared BM25 ranking core: (query_id, doc_id, score, rank) with
    rank ≤ ``topk`` — used by both the standalone top-k query and the
    hybrid RRF fusion leg."""
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # dl derived FROM tf (Σ tf per doc ≡ token count — exact BIGINT
    # identity), so the corpus is tokenized once and AQE reuses tf's
    # exchange for the dl/avgdl lineage instead of a second full
    # explode+aggregate pass (r12, guide §1.2/§2.4).
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    q = values_frame(
        spark, [(qid, t) for qid, terms in _QUERIES for t in terms], "query_id int, token string"
    )
    hits = (
        F.broadcast(q)
        .join(tf, "token")
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq.join(F.broadcast(q.select("token").distinct()), "token")), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (_K1 + 1))
                / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
            ).alias("term_score"),
        )
    )
    scored = hits.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "score", "rank")
    )


@register("text_bm25_search", oracle=_BM25_ORACLE)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (k1=1.2, b=0.75) over a corpus-built inverted
    index. Scale shape: the index build is two hash aggregates over token
    postings; scoring touches only posting lists of the query terms (the
    query set is tiny → broadcast), and corpus stats (N, avgdl) ride as a
    one-row broadcast frame. Scores are rounded to 6 BEFORE ranking so
    tie-breaks are deterministic across engines; per-query top-k is a
    rank window over the already-aggregated hit set."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return _bm25_ranked(spark, docs, _TOPK)


# ---------------------------------------------------------------------------
# Hybrid lexical+semantic retrieval with reciprocal-rank fusion
# ---------------------------------------------------------------------------
_RRF_K = 60
_FUSE_TOPK = 20
_FINAL_K = 10
#: 1e9 integer scale: rrf contribution = 1e9 div (RRF_K + rank), exact in
#: both engines (positive integer floor division) — no float fusion math.
_RRF_SCALE = 1_000_000_000


def _rrf_ctes() -> str:
    """CTE chain shared by the RRF oracle and the round-8 feature
    re-rank oracle: everything up to the ``fused`` candidate frame."""
    from lithops_dataframe_spark.plans.similarity_q import _cos_sql

    qids = ", ".join(str(qid) for qid, _ in _QUERIES)
    return f"""
    {_BM25_CTES},
    lex AS (
        SELECT query_id, doc_id, rank::INT AS lex_rank
        FROM ranked WHERE rank <= {_FUSE_TOPK}
    ),
    qv AS (
        SELECT vec_id::INT AS query_id, embedding AS q_emb
        FROM embeddings WHERE vec_id IN ({qids})
    ),
    sims AS (
        SELECT qv.query_id, e.vec_id AS doc_id,
               {_cos_sql('qv.q_emb', 'e.embedding')} AS sim
        FROM embeddings e CROSS JOIN qv
    ),
    sem AS (
        SELECT query_id, doc_id, rk::INT AS sem_rank
        FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, doc_id) AS rk
            FROM sims
        ) WHERE rk <= {_FUSE_TOPK}
    ),
    fused AS (
        SELECT COALESCE(l.query_id, s.query_id) AS query_id,
               COALESCE(l.doc_id, s.doc_id) AS doc_id,
               l.lex_rank, s.sem_rank,
               (COALESCE({_RRF_SCALE} // ({_RRF_K} + l.lex_rank), 0)
                + COALESCE({_RRF_SCALE} // ({_RRF_K} + s.sem_rank), 0))::BIGINT AS rrf_micro
        FROM lex l FULL JOIN sem s
          ON l.query_id = s.query_id AND l.doc_id = s.doc_id
    )"""


def _rrf_oracle() -> str:
    return f"""
    {_rrf_ctes()}
    SELECT query_id, doc_id, lex_rank, sem_rank, rrf_micro, rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_micro DESC, doc_id)::INT AS rank
        FROM fused
    ) WHERE rank <= {_FINAL_K}
"""


def _hybrid_rrf_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (public recipe:
    Cormack et al. 2009): fuse a LEXICAL BM25 top-20 with a SEMANTIC
    cosine top-20 (the query's embedding against every document's
    embedding — documents and embeddings share the id space) by
    ``Σ 1/(60 + rank)``, kept EXACT as integer nano-units via positive
    floor division, then return each query's fused top-10.

    Scale shape: the lexical leg touches only query-term posting lists;
    the semantic leg is the brute_force_topk pattern (tiny broadcast
    query set × narrow corpus scan, per-query rank window); fusion joins
    two ≤(queries × 20)-row frames — driver-scale — so the whole plan's
    data movement is two corpus scans plus top-k shuffles. Swap the
    semantic leg to ann_topk's LSH candidates for the 100 TB serving
    path; fusion is unchanged."""
    from lithops_dataframe_spark.operators import similarity as S

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    lex = _bm25_ranked(spark, docs, _FUSE_TOPK).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    emb = ensure_parallelism(S.finite_vectors(load_table(spark, sf_dir, "embeddings")))
    qids = [qid for qid, _ in _QUERIES]
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        S.norm(F.col("embedding")).alias("q_nrm"),
    )
    # norms bound per row on both sides: one fold per (doc, query) pair,
    # bit-identical to inline cosine (r7 lesson)
    sims = (
        emb.withColumn("e_nrm", S.norm(F.col("embedding")))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            # zero-norm guard (r9 edge sweep): NULL sim ranks LAST on both
            # engines (Spark desc / DuckDB default are both NULLS LAST),
            # so the rank-based RRF arithmetic downstream stays identical
            F.when(
                F.col("q_nrm") * F.col("e_nrm") > 0,
                S.dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("e_nrm")),
            ).alias("sim"),
        )
    )
    wsem = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "doc_id")
    sem = (
        sims.withColumn("sem_rank", F.row_number().over(wsem).cast("int"))
        .filter(F.col("sem_rank") <= _FUSE_TOPK)
        .select("query_id", "doc_id", "sem_rank")
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_micro",
        (
            F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + lex_rank)"), F.lit(0))
            + F.coalesce(F.expr(f"{_RRF_SCALE} div ({_RRF_K} + sem_rank)"), F.lit(0))
        ).cast("long"),
    )
    wfin = Window.partitionBy("query_id").orderBy(F.col("rrf_micro").desc(), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(wfin).cast("int"))
        .filter(F.col("rank") <= _FINAL_K)
        .select("query_id", "doc_id", "lex_rank", "sem_rank", "rrf_micro", "rank")
    )


@register("retrieval_hybrid_rrf", oracle=S.finite_emb_oracle(_rrf_oracle()))
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hybrid_rrf_frame(spark, sf_dir)


# ---------------------------------------------------------------------------
# Cross-encoder-style feature re-rank over the RRF candidate set (round 8)
# ---------------------------------------------------------------------------
_RERANK_K = 5
_COS_SCALE = 1_000_000
#: blend = n_overlap·1e6 + cos_micros + rrf_micro div 1000 — exact-match
#: term coverage dominates, dense similarity refines within an overlap
#: level, the fusion prior breaks remaining ties. All-BIGINT.
_BLEND_SQL = f"n_overlap * {_COS_SCALE} + cos_micros + rrf_micro // 1000"


def _rerank_oracle() -> str:
    from lithops_dataframe_spark.plans.similarity_q import _cos_sql

    return f"""
    {_rrf_ctes()},
    final AS (
        SELECT query_id, doc_id, rrf_micro FROM (
            SELECT query_id, doc_id, rrf_micro,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY rrf_micro DESC, doc_id) AS rk
            FROM fused
        ) WHERE rk <= {_FINAL_K}
    ),
    ov AS (
        SELECT q.query_id, tf.doc_id, COUNT(*)::BIGINT AS n_overlap
        FROM q JOIN tf ON tf.token = q.token
        GROUP BY 1, 2
    ),
    feat AS (
        SELECT f.query_id, f.doc_id, f.rrf_micro,
               COALESCE(ov.n_overlap, 0)::BIGINT AS n_overlap,
               COALESCE(FLOOR({_cos_sql('qv.q_emb', 'e.embedding')}
                              * {_COS_SCALE} + 0.5), 0)::BIGINT AS cos_micros
        FROM final f
        JOIN qv ON qv.query_id = f.query_id
        LEFT JOIN embeddings e ON e.vec_id = f.doc_id
        LEFT JOIN ov ON ov.query_id = f.query_id AND ov.doc_id = f.doc_id
    )
    SELECT query_id, doc_id, n_overlap, cos_micros, rrf_micro,
           ({_BLEND_SQL})::BIGINT AS blend, rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY {_BLEND_SQL} DESC, doc_id)::INT AS rank
        FROM feat
    ) WHERE rank <= {_RERANK_K}
"""


@register("retrieval_rerank_features", oracle=S.finite_emb_oracle(_rerank_oracle()))
def retrieval_rerank_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder-style feature re-rank (round 8, VERDICT r7 task 6):
    the second retrieval stage every production stack runs on top of a
    cheap first stage. The RRF top-10 candidate set (bounded: queries ×
    10 rows) is re-scored with richer per-pair features — exact
    query-term coverage (distinct query terms present in the document),
    full-precision cosine in integer micros, and the fusion prior — and
    each query's top-5 by the exact-integer blend is returned.

    Exactness: blend = n_overlap·1e6 + FLOOR(cos·1e6 + 0.5) +
    rrf_micro div 1000 — all BIGINT; candidates without an embedding
    (doc_id beyond the embeddings table) score cos_micros = 0 on both
    engines.

    Scale shape: feature extraction is driven BY the bounded candidate
    set — the term-coverage pass scans the corpus once, semi-joined down
    to candidate doc_ids via broadcast before the distinct, and the
    cosine pass touches only candidate embeddings (broadcast candidate
    keys into the embeddings scan). Everything after the scans is
    driver-scale (≤ queries × 10 rows), so the re-rank stage adds one
    corpus scan + one embeddings scan regardless of corpus size — the
    property that makes a 100 TB second stage affordable. A learned
    cross-encoder would swap the blend for a model score batched over
    the same bounded candidate frame (Pandas-UDF), leaving the plan
    unchanged."""
    from lithops_dataframe_spark.operators import similarity as S

    from lithops_dataframe_spark import cache

    fused = _hybrid_rrf_frame(spark, sf_dir)
    # BOUNDED (queries × FINAL_K rows) but expensive lineage: the whole
    # first-stage RRF (BM25 leg + dense leg + fusion). It feeds the
    # candidate-key broadcast (cdocs), the embeddings semi-join AND the
    # final feature join — without a persist each consumer re-runs both
    # first-stage corpus scans (r12: three full RRF executions per run,
    # guide §5 "caching is worth it when reused and recompute is
    # expensive").
    cand = cache.persist_tracked(fused.select("query_id", "doc_id", "rrf_micro"))

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    q = values_frame(
        spark,
        [(qid, t) for qid, terms in _QUERIES for t in terms],
        "query_id int, token string",
    )
    cdocs = cand.select("doc_id").distinct()
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    ov = (
        tok.join(F.broadcast(cdocs), "doc_id")
        .join(F.broadcast(q), "token")
        .select("query_id", "doc_id", "token")
        .distinct()
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )

    emb = ensure_parallelism(S.finite_vectors(load_table(spark, sf_dir, "embeddings")))
    qids = [qid for qid, _ in _QUERIES]
    qv = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        S.norm(F.col("embedding")).alias("q_nrm"),
    )
    ce = (
        emb.join(
            F.broadcast(cdocs.select(F.col("doc_id").alias("vec_id"))), "vec_id"
        )
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").alias("d_emb"),
            S.norm(F.col("embedding")).alias("e_nrm"),
        )
    )
    feat = (
        cand.join(F.broadcast(qv), "query_id")
        .join(F.broadcast(ce), "doc_id", "left")
        .join(F.broadcast(ov), ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "doc_id",
            "rrf_micro",
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
            F.coalesce(
                F.floor(
                    # ANSI guard (ADVICE r8): a zero-norm query or candidate
                    # embedding must yield NULL→0 like the oracle's NULLIF,
                    # not a DIVIDE_BY_ZERO error (same class as the r8 fix
                    # in similarity.py brute_force_topk).
                    F.when(
                        F.col("q_nrm") * F.col("e_nrm") > 0,
                        S.dot(F.col("q_emb"), F.col("d_emb"))
                        / (F.col("q_nrm") * F.col("e_nrm")),
                    )
                    * _COS_SCALE
                    + 0.5
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("cos_micros"),
        )
    )
    blend = (
        F.col("n_overlap") * _COS_SCALE
        + F.col("cos_micros")
        + F.expr("rrf_micro div 1000")
    ).cast("long")
    wr = Window.partitionBy("query_id").orderBy(F.col("blend").desc(), "doc_id")
    return (
        feat.withColumn("blend", blend)
        .withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= _RERANK_K)
        .select(
            "query_id", "doc_id", "n_overlap", "cos_micros", "rrf_micro", "blend", "rank"
        )
    )


# ---------------------------------------------------------------------------
# SCD type 2
# ---------------------------------------------------------------------------
_SCD2_ORACLE = """
    WITH upd AS (
        SELECT c_custkey, 'SEG' || (c_custkey % 4)::VARCHAR AS new_segment
        FROM customer WHERE c_custkey % 10 = 3
    )
    SELECT c.c_custkey,
           c.c_mktsegment AS segment,
           DATE '2024-01-01' AS valid_from,
           CASE WHEN u.c_custkey IS NOT NULL THEN DATE '2024-06-01' END AS valid_to,
           (u.c_custkey IS NULL) AS is_current
    FROM customer c LEFT JOIN upd u USING (c_custkey)
    UNION ALL
    SELECT c_custkey, new_segment, DATE '2024-06-01', NULL, TRUE FROM upd
"""


@register("scd2_customer_dim", oracle=_SCD2_ORACLE)
def scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: a staged update set (derived
    deterministically here; a real pipeline stages it from CDC) closes the
    old version's validity interval and opens a new current version. Pure
    relational upsert: one equi-join of dimension × updates (updates side
    broadcast — CDC batches are small relative to the dimension) + a
    union of the new versions. No MERGE engine support needed, and the
    write side pairs with partitioned parquet overwrite by key range."""
    cust = load_table(spark, sf_dir, "customer")
    upd = (
        cust.filter(F.col("c_custkey") % 10 == 3)
        .select(
            "c_custkey",
            F.concat(F.lit("SEG"), (F.col("c_custkey") % 4).cast("string")).alias(
                "new_segment"
            ),
        )
    )
    closed = (
        cust.join(F.broadcast(upd), "c_custkey", "left")
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.lit("2024-01-01").cast("date").alias("valid_from"),
            F.when(
                F.col("new_segment").isNotNull(), F.lit("2024-06-01").cast("date")
            ).alias("valid_to"),
            F.col("new_segment").isNull().alias("is_current"),
        )
    )
    fresh = upd.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        F.lit("2024-06-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionAll(fresh)


_PIT_ORACLE = """
    WITH upd AS (
        SELECT c_custkey, 'SEG' || (c_custkey % 4)::VARCHAR AS new_segment
        FROM customer WHERE c_custkey % 10 = 3
    ),
    dim AS (
        SELECT c.c_custkey, c.c_mktsegment AS segment,
               DATE '1992-01-01' AS valid_from,
               CASE WHEN u.c_custkey IS NOT NULL THEN DATE '1995-06-01' END
                 AS valid_to
        FROM customer c LEFT JOIN upd u USING (c_custkey)
        UNION ALL
        SELECT c_custkey, new_segment, DATE '1995-06-01', NULL FROM upd
    )
    SELECT d.segment,
           COUNT(*)::BIGINT AS n_orders,
           SUM((FLOOR(o.o_totalprice * 100 + 0.5))::BIGINT)::BIGINT
             AS revenue_cents
    FROM orders o
    JOIN dim d
      ON d.c_custkey = o.o_custkey
     AND d.valid_from <= o.o_orderdate
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    GROUP BY d.segment
"""


@register("join_scd2_pointintime", oracle=_PIT_ORACLE)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct fact enrichment against an SCD2 dimension —
    the join that makes slowly-changing dimensions WORTH maintaining:
    each order joins the customer-segment version that was valid ON ITS
    ORDER DATE (half-open [valid_from, valid_to)), so facts before the
    segment change aggregate under the historical segment and facts
    after it under the new one. Training-data relevance: this is exactly
    how features must be joined to labels to avoid leakage (no
    peeking at future attribute values).

    Plan shape: equi-join on the dimension key + residual range
    predicate — correct and cheap while versions-per-key is small (2
    here; the common case). With deep version histories the same
    semantics run as an as-of join on valid_from (operators/joins.py)
    after a bucketed sort. Revenue sums exact half-up cents — no float
    tolerance."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    upd = cust.filter(F.col("c_custkey") % 10 == 3).select(
        "c_custkey",
        F.concat(F.lit("SEG"), (F.col("c_custkey") % 4).cast("string")).alias(
            "new_segment"
        ),
    )
    v1 = cust.join(F.broadcast(upd), "c_custkey", "left").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("date").alias("valid_from"),
        F.when(
            F.col("new_segment").isNotNull(), F.lit("1995-06-01").cast("date")
        ).alias("valid_to"),
    )
    v2 = upd.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        F.lit("1995-06-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    dim = v1.unionAll(v2)
    j = orders.join(
        dim,
        (dim.c_custkey == orders.o_custkey)
        & (dim.valid_from <= orders.o_orderdate)
        & (dim.valid_to.isNull() | (orders.o_orderdate < dim.valid_to)),
    )
    return j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# MMR-diversified retrieval (maximal marginal relevance re-rank)
# ---------------------------------------------------------------------------
_MMR_Q = 3  # anchors = vec_id < 3
_MMR_POOL = 20
_MMR_K = 5
# λ = 0.7 expressed in integer tenths: score_decimicro = 7·sim − 3·maxsel
_MMR_LAM10 = 7
_MMR_MU10 = 3


def _mmr_oracle() -> str:
    """Unrolled greedy replay: pool = cosine top-20, then K−1 exact
    argmax steps of λ·sim_q − (1−λ)·max-sim-to-selected. All arithmetic
    is integer: sims enter as FLOOR(cos·1e6 + 0.5) micros (floor of the
    identical binary double — no decimal ROUND semantics anywhere) and
    λ=0.7 becomes the 7/3 decimicro weights, so the argmax and the
    output score replay bit-identically."""
    from lithops_dataframe_spark.plans.similarity_q import _cos_sql, _dot_sql

    # norm predicate mirrors the Spark pool's sim IS NOT NULL filter: a
    # zero-norm vector has no defined cosine and is excluded from the MMR
    # pool on both engines (r9 edge sweep)
    sql = f"""
    WITH pool0 AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               (FLOOR({_cos_sql('q.embedding', 'c.embedding')} * 1000000 + 0.5))::BIGINT
                   AS sim_micro,
               row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY {_cos_sql('q.embedding', 'c.embedding')} DESC,
                            c.vec_id ASC) AS rk
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_MMR_Q}
          AND {_dot_sql('q.embedding', 'q.embedding')} > 0
          AND {_dot_sql('c.embedding', 'c.embedding')} > 0
    ),
    pool AS (SELECT query_id, neighbor_id, sim_micro FROM pool0 WHERE rk <= {_MMR_POOL}),
    pp AS (
        SELECT p1.query_id, p1.neighbor_id AS a, p2.neighbor_id AS b,
               (FLOOR({_cos_sql('e1.embedding', 'e2.embedding')} * 1000000 + 0.5))::BIGINT
                   AS sim_micro
        FROM pool p1
        JOIN pool p2 ON p1.query_id = p2.query_id
                    AND p1.neighbor_id <> p2.neighbor_id
        JOIN embeddings e1 ON e1.vec_id = p1.neighbor_id
        JOIN embeddings e2 ON e2.vec_id = p2.neighbor_id
    ),
    pick1 AS (
        SELECT query_id, neighbor_id, {_MMR_LAM10} * sim_micro AS score,
               row_number() OVER (PARTITION BY query_id
                   ORDER BY sim_micro DESC, neighbor_id ASC) AS pr
        FROM pool
    ),
    sel1 AS (
        SELECT query_id, 1 AS step, neighbor_id, score
        FROM pick1 WHERE pr = 1
    )"""
    prev = "sel1"
    for t in range(2, _MMR_K + 1):
        sql += f""",
    cand{t} AS (
        SELECT p.query_id, p.neighbor_id,
               {_MMR_LAM10} * p.sim_micro - {_MMR_MU10} * MAX(pr.sim_micro) AS score
        FROM pool p
        JOIN pp pr ON pr.query_id = p.query_id AND pr.a = p.neighbor_id
        JOIN {prev} s ON s.query_id = pr.query_id AND s.neighbor_id = pr.b
        WHERE NOT EXISTS (
            SELECT 1 FROM {prev} s2
            WHERE s2.query_id = p.query_id AND s2.neighbor_id = p.neighbor_id)
        GROUP BY p.query_id, p.neighbor_id, p.sim_micro
    ),
    pick{t} AS (
        SELECT query_id, neighbor_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id ASC) AS pr
        FROM cand{t}
    ),
    sel{t} AS (
        SELECT query_id, step, neighbor_id, score FROM {prev}
        UNION ALL
        SELECT query_id, {t} AS step, neighbor_id, score
        FROM pick{t} WHERE pr = 1
    )"""
        prev = f"sel{t}"
    sql += f"""
    SELECT query_id, step::INT AS step, neighbor_id,
           score::BIGINT AS score_decimicro
    FROM {prev}
    """
    return sql


@register("retrieval_mmr_rerank", oracle=S.finite_emb_oracle(_mmr_oracle()))
def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking: take each anchor's cosine
    top-20 candidate pool and greedily select 5 results maximizing
    λ·relevance − (1−λ)·max-similarity-to-already-selected — the
    diversity-aware re-rank every RAG retriever runs so five near-copies
    don't fill the context window.

    Scale shape: relevance and the pool×pool similarity matrix are both
    JVM-side (broadcast anchors; pool joins are k²-bounded per anchor,
    never corpus×corpus); only the inherently sequential K-step greedy
    runs in a cogrouped ``applyInPandas`` — each task receives ONE
    anchor's 20-row pool + 380-row pair matrix, so the Python stage
    touches O(anchors·k²) rows regardless of corpus size. Exactness:
    sims are converted to integer micros JVM-side (FLOOR of the binary
    double — no decimal-ROUND tie class), λ=0.7 becomes exact 7/3
    decimicro weights, and the whole greedy is BIGINT arithmetic, so the
    unrolled DuckDB replay is bit-identical (the first float version of
    this query diverged on .xxxxx55 rounding ties at BOTH test SFs)."""
    import pandas as pd

    from pyspark.sql.window import Window

    from lithops_dataframe_spark.operators import similarity as S

    def micros(col):
        return F.floor(col * F.lit(1000000) + F.lit(0.5)).cast("long")

    emb = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < _MMR_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        S.norm(F.col("embedding")).alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        S.norm(F.col("embedding")).alias("c_nrm"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    pool = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            # a zero-norm candidate has NO defined cosine to the anchor —
            # it cannot participate in an MMR pool (the greedy's integer
            # micros must be finite), so both engines exclude it (r9 edge
            # sweep; oracle pool0 carries the matching norm predicate)
            "sim",
            F.when(
                F.col("q_nrm") * F.col("c_nrm") > 0,
                S.dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
            ),
        )
        .filter(F.col("sim").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MMR_POOL)
        .select("query_id", "neighbor_id", micros(F.col("sim")).alias("sim_micro"))
    )

    # pair matrix built on a FRESH scan lineage (cogroup sides must not
    # share exprIds — the self-join attribute-dedup trap documented at
    # udf_cogroup_reconcile); the pool×pool self-join uses the supported
    # alias() + qualified-column route
    emb_b = S.finite_vectors(load_table(spark, sf_dir, "embeddings"))
    q_b = emb_b.filter(F.col("vec_id") < _MMR_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        S.norm(F.col("embedding")).alias("q_nrm"),
    )
    c_b = emb_b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        S.norm(F.col("embedding")).alias("c_nrm"),
    )
    pool_b = (
        c_b.crossJoin(F.broadcast(q_b))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            F.when(
                F.col("q_nrm") * F.col("c_nrm") > 0,
                S.dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm")),
            ),
        )
        .filter(F.col("sim").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MMR_POOL)
        .select("query_id", "neighbor_id")
    )
    e1 = emb_b.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("emb_a"),
        S.norm(F.col("embedding")).alias("nrm_a"),
    )
    e2 = emb_b.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("emb_b"),
        S.norm(F.col("embedding")).alias("nrm_b"),
    )
    pairs = (
        pool_b.alias("x")
        .join(
            pool_b.alias("y"),
            (F.col("x.query_id") == F.col("y.query_id"))
            & (F.col("x.neighbor_id") != F.col("y.neighbor_id")),
        )
        .select(
            F.col("x.query_id").alias("query_id"),
            F.col("x.neighbor_id").alias("a"),
            F.col("y.neighbor_id").alias("b"),
        )
        .join(F.broadcast(e1), "a")
        .join(F.broadcast(e2), "b")
        .select(
            "query_id",
            "a",
            "b",
            # pool members all have nonzero norms by construction (the
            # pool filter above); the guard is defense in depth
            micros(
                F.when(
                    F.col("nrm_a") * F.col("nrm_b") > 0,
                    S.dot(F.col("emb_a"), F.col("emb_b"))
                    / (F.col("nrm_a") * F.col("nrm_b")),
                )
            ).alias("sim_micro"),
        )
    )

    lam10, mu10 = _MMR_LAM10, _MMR_MU10

    def greedy(key, pool_pdf: pd.DataFrame, pair_pdf: pd.DataFrame) -> pd.DataFrame:
        if pool_pdf.empty:
            return pd.DataFrame(
                columns=["query_id", "step", "neighbor_id", "score_decimicro"]
            )
        qid = int(pool_pdf["query_id"].iloc[0])
        sims = {
            int(n): int(s)
            for n, s in zip(pool_pdf["neighbor_id"], pool_pdf["sim_micro"])
        }
        pair = {
            (int(a), int(b)): int(s)
            for a, b, s in zip(pair_pdf["a"], pair_pdf["b"], pair_pdf["sim_micro"])
        }
        remaining = sorted(sims)
        first = max(remaining, key=lambda cand: (sims[cand], -cand))
        selected = [(1, first, lam10 * sims[first])]
        remaining.remove(first)
        for step in range(2, _MMR_K + 1):
            best, best_score = None, None
            for cand in remaining:  # ascending id = tie-break order
                maxsel = max(pair[(cand, s)] for _, s, _ in selected)
                score = lam10 * sims[cand] - mu10 * maxsel
                if best_score is None or score > best_score:
                    best, best_score = cand, score
            selected.append((step, best, best_score))
            remaining.remove(best)
        return pd.DataFrame(
            {
                "query_id": qid,
                "step": [s for s, _, _ in selected],
                "neighbor_id": [n for _, n, _ in selected],
                "score_decimicro": [sc for _, _, sc in selected],
            }
        )

    out_schema = (
        "query_id bigint, step int, neighbor_id bigint, score_decimicro bigint"
    )
    return (
        pool.groupBy("query_id")
        .cogroup(pairs.groupBy("query_id"))
        .applyInPandas(greedy, schema=out_schema)
    )


# ---------------------------------------------------------------------------
# rank-biased overlap between the lexical and semantic rankings
# ---------------------------------------------------------------------------
_RBO_D = 10  # truncation depth
# p = 1/2 makes every weight an exact dyadic rational: the truncated
# RBO-min is Σ_{d=1..D} X_d / (d·2^d) with X_d = |lex@d ∩ sem@d|. A pair
# seen at ranks (rl, rs) contributes to every depth d ≥ max(rl, rs), so
# its total weight is W(m) = Σ_{d=m..D} SCALE/(d·2^d) — a 10-entry exact
# integer lookup with SCALE = lcm(1..10) · 2^10.
_RBO_SCALE = 2520 * 1024


def _rbo_weights() -> list[int]:
    per_d = [_RBO_SCALE // (d * (1 << d)) for d in range(1, _RBO_D + 1)]
    assert all(_RBO_SCALE % (d * (1 << d)) == 0 for d in range(1, _RBO_D + 1))
    return [sum(per_d[m - 1 :]) for m in range(1, _RBO_D + 1)]


_RBO_W = _rbo_weights()
_RBO_W_SQL = "CASE m " + " ".join(
    f"WHEN {m} THEN {w}" for m, w in enumerate(_RBO_W, start=1)
) + " END"


def _rbo_oracle() -> str:
    from lithops_dataframe_spark.plans.similarity_q import _cos_sql

    qids = ", ".join(str(qid) for qid, _ in _QUERIES)
    return f"""
    {_BM25_CTES},
    lex AS (
        SELECT query_id, doc_id, rank::INT AS rl
        FROM ranked WHERE rank <= {_RBO_D}
    ),
    qv AS (
        SELECT vec_id::INT AS query_id, embedding AS q_emb
        FROM embeddings WHERE vec_id IN ({qids})
    ),
    sems AS (
        SELECT query_id, doc_id, rk::INT AS rs FROM (
            SELECT qv.query_id, e.vec_id AS doc_id,
                   row_number() OVER (PARTITION BY qv.query_id
                       ORDER BY {_cos_sql('qv.q_emb', 'e.embedding')} DESC,
                                e.vec_id) AS rk
            FROM embeddings e CROSS JOIN qv
        ) WHERE rk <= {_RBO_D}
    ),
    pairs AS (
        SELECT l.query_id, GREATEST(l.rl, s.rs) AS m
        FROM lex l JOIN sems s
          ON s.query_id = l.query_id AND s.doc_id = l.doc_id
    )
    SELECT q.query_id,
           COUNT(p.m)::BIGINT AS n_common,
           COALESCE(SUM({_RBO_W_SQL}), 0)::BIGINT AS rbo_scaled
    FROM (SELECT DISTINCT query_id FROM lex) q
    LEFT JOIN pairs p ON p.query_id = q.query_id
    GROUP BY q.query_id
"""


@register("retrieval_rbo_lex_vs_sem", oracle=S.finite_emb_oracle(_rbo_oracle()))
def retrieval_rbo_lex_vs_sem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010) between the lexical BM25
    top-10 and the semantic cosine top-10, per query — the top-weighted
    ranking-agreement metric that tells a hybrid-retrieval owner how
    complementary the two legs actually are (RBO≈1 → the semantic index
    adds nothing; RBO≈0 → fusion is load-bearing). Computed EXACTLY: with
    persistence p=1/2 every depth weight is a dyadic rational, so each
    matched pair contributes a precomputed integer W(max(rank_lex,
    rank_sem)) and the score is an all-BIGINT sum (scale 2520·1024 —
    divide by it for the [0, ~0.65] truncated-RBO value).

    Scale shape: both legs are the existing bounded-query rankings (the
    semantic leg swaps to ann_topk at serving scale); the metric itself
    joins two ≤(queries×10)-row frames and aggregates — free at any
    corpus size."""
    from lithops_dataframe_spark.operators import similarity as S

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    lex = _bm25_ranked(spark, docs, _RBO_D).select(
        "query_id", "doc_id", F.col("rank").alias("rl")
    )
    emb = ensure_parallelism(S.finite_vectors(load_table(spark, sf_dir, "embeddings")))
    qids = [qid for qid, _ in _QUERIES]
    q = emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").cast("int").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        S.norm(F.col("embedding")).alias("q_nrm"),
    )
    # norms bound per row on both sides: one fold per (doc, query) pair,
    # bit-identical to inline cosine (r7 lesson)
    sims = (
        emb.withColumn("e_nrm", S.norm(F.col("embedding")))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            # zero-norm guard (r9): NULL sim ranks last on both engines;
            # the rank-based RBO weights downstream stay identical
            F.when(
                F.col("q_nrm") * F.col("e_nrm") > 0,
                S.dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("e_nrm")),
            ).alias("sim"),
        )
    )
    wsem = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "doc_id")
    sem = (
        sims.withColumn("rs", F.row_number().over(wsem).cast("int"))
        .filter(F.col("rs") <= _RBO_D)
        .select("query_id", "doc_id", "rs")
    )
    pairs = lex.join(sem, ["query_id", "doc_id"]).select(
        "query_id", F.greatest("rl", "rs").alias("m")
    )
    w_expr = F.expr(_RBO_W_SQL)
    qframe = lex.select("query_id").distinct()
    return (
        qframe.join(pairs, "query_id", "left")
        .groupBy("query_id")
        .agg(
            F.count("m").cast("long").alias("n_common"),
            F.coalesce(F.sum(w_expr), F.lit(0)).cast("long").alias("rbo_scaled"),
        )
    )
