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
from lithops_dataframe_spark.operators.util import ensure_parallelism
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

_BM25_ORACLE = f"""
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
    )
    SELECT query_id, doc_id, score, rank::INT AS rank
    FROM ranked WHERE rank <= {_TOPK}
"""


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
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    q = spark.createDataFrame(
        [(qid, t) for qid, terms in _QUERIES for t in terms], "query_id int, token string"
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
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "doc_id", "score", "rank")
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
