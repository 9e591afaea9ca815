"""End-to-end corpus-cleaning pipeline query — the full composition
(quality gate → lang gate → exact dedup → MinHash-LSH near-dup removal →
stats) checked against a DuckDB oracle that mirrors every stage from the
same constants. The strongest single correctness statement in the repo:
five operator families composed, one value-hash."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lithops_dataframe_spark.catalog import load_table
from lithops_dataframe_spark.functions import hashing as H
from lithops_dataframe_spark.functions import text as T
from lithops_dataframe_spark.operators.pipeline import clean_corpus
from lithops_dataframe_spark.plans.registry import register

_MIN_Q = 0.5
_LANGS = "('en', 'de', 'fr', 'es', 'zh')"
_SH = H.word_shingles_sql("text", 2)
_BANDS = H.band_signatures_sql("sig", 4)
_BAND_UNION = "\n          UNION ALL ".join(
    f"SELECT id, {j} AS band_idx, {expr} AS band_key FROM sig" for j, expr in enumerate(_BANDS)
)

_PIPELINE_ORACLE = f"""
    WITH gated AS (
        SELECT doc_id, lang, text, {T.quality_score_sql('text')} AS quality
        FROM documents
        WHERE {T.quality_score_sql('text')} >= {_MIN_Q} AND lang IN {_LANGS}
    ),
    exact AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ),
    shng AS (SELECT doc_id AS id, {_SH} AS sh FROM exact),
    sig AS (SELECT id, sh, {H.minhash_signature_sql('sh')} AS sig FROM shng),
    bands AS (
          {_BAND_UNION}
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id
    ),
    losers AS (
        SELECT DISTINCT cand.id_b AS doc_id
        FROM cand
        JOIN shng sa ON sa.id = cand.id_a
        JOIN shng sb ON sb.id = cand.id_b
        WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
              / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.6
    )
    SELECT e.doc_id, e.lang,
           len({T.ws_tokens_sql('e.text')})::BIGINT AS n_tokens,
           ROUND(e.quality, 6) AS quality
    FROM exact e
    WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)
"""


@register("pipeline_clean_corpus", oracle=_PIPELINE_ORACLE)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return clean_corpus(docs, min_quality=_MIN_Q)


# ---------------------------------------------------------------------------
# train-data preparation manifest (round 9 capstone: quality gate → exact
# dedup → √n temperature quotas → md5-rank selection → packing arithmetic,
# one value-hash across five composed stages)
# ---------------------------------------------------------------------------
_TM_MIN_TOKENS = 5
_TM_MIN_SCORE = 600  # per-mille distinct-token ratio
_TM_BUDGET = 60  # selected docs across the corpus
_TM_SEQ = 256  # tokens per packed training sequence

_TM_ORACLE = f"""
    WITH raw AS (
        SELECT doc_id, source, md5(text) AS fp,
               len(string_split(text, ' '))::BIGINT AS t,
               {T.distinct_permille_sql('text')} AS score
        FROM documents
    ),
    q AS (
        SELECT * FROM raw WHERE t >= {_TM_MIN_TOKENS} AND score >= {_TM_MIN_SCORE}
    ),
    uniq AS (
        SELECT * FROM q
        WHERE doc_id IN (
            SELECT MIN(doc_id) FROM q GROUP BY fp
        )
    ),
    wt AS (
        SELECT source, COUNT(*)::BIGINT AS n_u,
               FLOOR(SQRT(COUNT(*)))::BIGINT AS w
        FROM uniq GROUP BY source
    ),
    tot AS (SELECT SUM(w)::BIGINT AS tw FROM wt),
    quota AS (
        SELECT wt.source, wt.n_u,
               CASE WHEN tot.tw > 0
                    THEN LEAST(wt.n_u, {_TM_BUDGET} * wt.w // tot.tw)
                    ELSE 0 END::BIGINT AS k
        FROM wt, tot
    ),
    ranked AS (
        SELECT u.source, u.doc_id, u.t,
               row_number() OVER (
                   PARTITION BY u.source
                   ORDER BY md5(CAST(u.doc_id AS VARCHAR)), u.doc_id
               ) AS r
        FROM uniq u
    ),
    sel AS (
        SELECT ranked.source, ranked.t
        FROM ranked JOIN quota ON quota.source = ranked.source
        WHERE ranked.r <= quota.k
    ),
    selagg AS (
        SELECT source, COUNT(*)::BIGINT AS n_selected,
               SUM(t)::BIGINT AS sel_tokens
        FROM sel GROUP BY source
    ),
    rawagg AS (
        SELECT source, COUNT(*)::BIGINT AS n_raw,
               SUM(CASE WHEN t >= {_TM_MIN_TOKENS}
                         AND score >= {_TM_MIN_SCORE} THEN 1 ELSE 0 END)::BIGINT
                   AS n_quality
        FROM raw GROUP BY source
    )
    SELECT r.source, r.n_raw, r.n_quality,
           COALESCE(qd.n_u, 0)::BIGINT AS n_unique,
           COALESCE(qd.k, 0)::BIGINT AS quota,
           COALESCE(s.n_selected, 0)::BIGINT AS n_selected,
           COALESCE(s.sel_tokens, 0)::BIGINT AS sel_tokens,
           ((COALESCE(s.sel_tokens, 0) + {_TM_SEQ - 1}) // {_TM_SEQ})::BIGINT
               AS n_packs
    FROM rawagg r
    LEFT JOIN quota qd ON qd.source = r.source
    LEFT JOIN selagg s ON s.source = r.source
"""


@register("pipeline_traindata_manifest", oracle=_TM_ORACLE)
def pipeline_traindata_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-data preparation manifest — the end-to-end composition a
    pretraining pipeline runs before writing shards, audited per source
    in ONE value-hash: quality gate (≥5 tokens, ≥600‰ distinct-token
    ratio) → exact dedup (keep-min-doc_id per md5(text) fingerprint) →
    temperature-0.5 mixture quotas (⌊√n⌋ weights over unique survivors,
    integer budget split) → deterministic md5-rank selection per source
    → concat-and-chunk packing arithmetic (ceil(sel_tokens/256)
    sequences). Five stages, every number BIGINT or md5-ordered, so the
    whole composition is engine-exact — the traindata twin of
    ``pipeline_clean_corpus``.

    Scale shape: two hash aggregates over the corpus (raw audit + dedup
    fingerprints), one per-source rank window over quality survivors
    (WindowGroupLimit under the quota filter), quota arithmetic on a
    source-count frame joined back as a broadcast (lazy — no driver
    collect), final left-join fan-in on the ~sources-sized audit frames.
    No global window, no cartesian; the 100 TB cost is the two corpus
    scans."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from lithops_dataframe_spark.functions import text as TX

    from lithops_dataframe_spark import cache

    docs = load_table(spark, sf_dir, "documents")
    # slim projection: fp replaces text immediately, so the persisted
    # frames below never materialize document bodies — and persisting
    # raw/uniq means the corpus is TOKENIZED ONCE, not once per subtree
    # (raw feeds rawagg+q; q feeds keep+join; uniq feeds wt+ranked)
    raw = cache.persist_tracked(
        docs.select(
            "doc_id",
            "source",
            F.md5("text").alias("fp"),
            F.size(TX.ws_tokens(F.col("text"))).cast("long").alias("t"),
            TX.distinct_permille(F.col("text")).alias("score"),
        )
    )
    q = raw.filter(
        (F.col("t") >= _TM_MIN_TOKENS) & (F.col("score") >= _TM_MIN_SCORE)
    )
    keep = q.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    uniq = cache.persist_tracked(q.join(keep.select("doc_id"), "doc_id"))

    wt = uniq.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_u"))
    wt = wt.withColumn("w", F.floor(F.sqrt(F.col("n_u"))).cast("long"))
    tot = wt.agg(F.sum("w").cast("long").alias("tw"))
    quota = wt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_u",
        F.when(
            F.col("tw") > 0,
            F.least(F.col("n_u"), F.expr(f"{_TM_BUDGET} * w div tw")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("k"),
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = uniq.select(
        "source", "doc_id", "t", F.row_number().over(w_rank).alias("r")
    )
    sel = ranked.join(F.broadcast(quota.select("source", "k")), "source").filter(
        F.col("r") <= F.col("k")
    )
    selagg = sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.sum("t").cast("long").alias("sel_tokens"),
    )
    rawagg = raw.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        # F.when(...).otherwise(0) ≡ the oracle's CASE ... ELSE 0: a
        # NULL-text row (t IS NULL → NULL predicate) counts 0, not NULL —
        # a bare cast() left an all-NULL source's n_quality NULL (r11
        # edge row: src2 is entirely fetch failures)
        F.sum(
            F.when(
                (F.col("t") >= _TM_MIN_TOKENS)
                & (F.col("score") >= _TM_MIN_SCORE),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
        .cast("long")
        .alias("n_quality"),
    )
    return (
        rawagg.join(quota.select("source", "n_u", "k"), "source", "left")
        .join(selagg, "source", "left")
        .select(
            "source",
            "n_raw",
            "n_quality",
            F.coalesce("n_u", F.lit(0)).cast("long").alias("n_unique"),
            F.coalesce("k", F.lit(0)).cast("long").alias("quota"),
            F.coalesce("n_selected", F.lit(0)).cast("long").alias("n_selected"),
            F.coalesce("sel_tokens", F.lit(0)).cast("long").alias("sel_tokens"),
            F.expr(f"(coalesce(sel_tokens, 0) + {_TM_SEQ - 1}) div {_TM_SEQ}")
            .cast("long")
            .alias("n_packs"),
        )
    )
