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
