"""Training-data selection queries (operators/dsir.py) — hashed-n-gram
importance resampling with a full value-hash DuckDB oracle.

The oracle replays the whole recipe — same md5-prefix token hash, same
B-bucket space, same add-one-smoothed ln ratios quantized to micro-units
— so model fit, scoring, and the top-K cut are all hash-gated, not just
row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.functions import hashing as H
from lithops_dataframe_spark.functions import text as T
from lithops_dataframe_spark.operators.dsir import B_BUCKETS, MICRO, dsir_select
from lithops_dataframe_spark.operators.util import ensure_parallelism
from lithops_dataframe_spark.plans.registry import register

#: Target slice: English documents (the "quality" distribution to
#: up-weight); raw model fits on the whole corpus, per the DSIR recipe.
_TARGET_LANG = "en"
_K = 100

_DSIR_ORACLE = f"""
    WITH ident AS MATERIALIZED (
        -- rid = PHYSICAL-row identity: duplicate doc_ids are two distinct
        -- documents and must score separately (r11 edge row; Spark scores
        -- per row, a bare GROUP BY doc_id merged their token bags).
        -- Ordering by (doc_id, text) makes rids deterministic up to
        -- interchangeable full duplicates.
        SELECT doc_id, lang, text,
               row_number() OVER (ORDER BY doc_id, text) AS rid
        FROM documents
    ),
    b AS MATERIALIZED (
        SELECT rid, doc_id,
               (lang = '{_TARGET_LANG}')::BIGINT AS is_t,
               {H.token_hash_sql('t.token')} % {B_BUCKETS} AS bucket
        FROM (
            SELECT rid, doc_id, lang, unnest(string_split(text, ' ')) AS token
            FROM ident
        ) t
    ),
    cnt AS MATERIALIZED (
        SELECT bucket, SUM(is_t)::BIGINT AS ct, COUNT(*)::BIGINT AS cr
        FROM b GROUP BY bucket
    ),
    tot AS MATERIALIZED (
        SELECT SUM(ct)::DOUBLE + {float(B_BUCKETS)} AS ttb,
               SUM(cr)::DOUBLE + {float(B_BUCKETS)} AS trb
        FROM cnt
    ),
    w AS MATERIALIZED (
        SELECT bucket,
               CAST(ROUND((ln((ct + 1.0) / ttb) - ln((cr + 1.0) / trb))
                          * {float(MICRO)}) AS BIGINT) AS wq
        FROM cnt, tot
    ),
    doc AS (
        SELECT b.rid, b.doc_id,
               COUNT(*)::BIGINT AS n_toks, SUM(w.wq)::BIGINT AS score_micro
        FROM b JOIN w USING (bucket)
        GROUP BY b.rid, b.doc_id
    )
    SELECT doc_id, n_toks, score_micro
    FROM doc
    ORDER BY score_micro DESC, doc_id, n_toks
    LIMIT {_K}
"""


@register("select_dsir_importance", oracle=_DSIR_ORACLE)
def select_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: fit hashed-unigram multinomials on the
    English slice (target) vs the whole corpus (raw), score every
    document by the exact-integer micro-quantized log-likelihood ratio of
    its token bag, and keep the top-100 most target-like documents.

    Scale shape: one ≤B-row bucket aggregate fits both models; the weight
    table is B=256 BIGINTs of driver state re-broadcast as an array
    literal; scoring is a zero-shuffle JVM `aggregate` fold per document;
    the top-K is TakeOrderedAndProject. Nothing grows with corpus size
    except the scan.
    """
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return dsir_select(docs, F.col("lang") == _TARGET_LANG, k=_K)


# ---------------------------------------------------------------------------
# deterministic per-group hash sample (salted-hash eval-set draw)
# ---------------------------------------------------------------------------
_HSAMPLE_K = 10

_HSAMPLE_ORACLE = f"""
    WITH h AS (
        SELECT source, doc_id, n_chars,
               md5('s1:' || doc_id::VARCHAR) AS hk
        FROM documents
    ),
    rk AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rank
        FROM h
    )
    SELECT source, rank::INT AS rank, doc_id, n_chars
    FROM rk WHERE rank <= {_HSAMPLE_K}
"""


@register("sample_hash_per_group", oracle=_HSAMPLE_ORACLE)
def sample_hash_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sample: the k documents per source with the
    smallest salted md5 — the reproducible "random" eval-set draw (same
    salt → same sample on any engine, any day, any partitioning; change
    the salt to redraw). This is how a pipeline freezes a review sample
    without a seed-dependent RNG.

    Scale shape: a narrow hash projection + one rank window per source
    (WindowGroupLimit pushes the top-k below the shuffle). md5 is
    byte-identical across engines; ties (impossible: doc_id is in the
    ordering) are deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    h = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.md5(F.concat(F.lit("s1:"), F.col("doc_id").cast("string"))).alias("hk"),
    )
    w = Window.partitionBy("source").orderBy("hk", "doc_id")
    return (
        h.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _HSAMPLE_K)
        .select("source", "rank", "doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# quality-greedy selection under a per-source token budget
# ---------------------------------------------------------------------------
_BUDGET_TOKENS = 20_000  # per-source token budget

_BUDGET_ORACLE = f"""
    WITH d AS (
        SELECT source, doc_id,
               len(string_split(text, ' '))::BIGINT AS t,
               {T.distinct_permille_sql('text')} AS score
        FROM documents
    ),
    ranked AS (
        SELECT source, doc_id, t, score,
               SUM(t) OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id ASC
                            ROWS UNBOUNDED PRECEDING) - t AS start_off
        FROM d
    ),
    sel AS (
        SELECT * FROM ranked WHERE start_off < {_BUDGET_TOKENS}
    )
    SELECT source,
           COUNT(*)::BIGINT AS n_selected,
           SUM(t)::BIGINT AS sel_tokens,
           MIN(score)::BIGINT AS min_score,
           MAX(start_off + t)::BIGINT AS budget_used
    FROM sel GROUP BY source
"""


@register("select_token_budget_greedy", oracle=_BUDGET_ORACLE)
def select_token_budget_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped quality-greedy corpus selection: per source, rank
    documents by an exact integer quality score (per-mille distinct-token
    ratio — repetitive docs score low) and take them greedily until the
    per-source token budget is exhausted (a document may start strictly
    inside the budget; the last one may overhang — the standard greedy
    knapsack relaxation). This is the "give me the best N-token slice of
    each source" primitive of corpus curation; the audit reports how many
    documents made the cut and the marginal (lowest admitted) quality.

    Scale shape: score and token count are narrow maps; ONE running-sum
    window per source (partitioned — never global); tiny final aggregate.
    All-BIGINT arithmetic (integer per-mille score, integer token counts)
    — bit-identical on any engine, no float ordering anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    d = docs.select(
        "source",
        "doc_id",
        F.size(T.ws_tokens(F.col("text"))).cast("long").alias("t"),
        T.distinct_permille(F.col("text")).alias("score"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = d.withColumn("start_off", F.sum("t").over(w) - F.col("t"))
    sel = ranked.filter(F.col("start_off") < _BUDGET_TOKENS)
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.sum("t").cast("long").alias("sel_tokens"),
        F.min("score").cast("long").alias("min_score"),
        F.max(F.col("start_off") + F.col("t")).cast("long").alias("budget_used"),
    )
